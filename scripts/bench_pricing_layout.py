"""A/B adjudication for q_pricing_summary's exact form vs its
bucketed-layout twin (round-16 verdict item 1).

Protocol: ONE process, alternating variants (the round-14 co-tenant
lesson — never adjudicate across processes/loads), N-fold key-shifted
replica via bench_scaling.replicate, DuckDB oracle timed on the same
replica. The bucketed table build is reported separately as the
one-time layout cost (the M8 'CREATE INDEX' analog — a warehouse
pays it once, then every COUNT(DISTINCT order)-shaped aggregate runs
exchange-free).

Usage: python scripts/bench_pricing_layout.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import duck_con_for, replicate, time_oracle, time_query

from clinical_data_warehouse_bi_spark.queries.core import (
    pricing_summary_bucketed,
    q_pricing_summary,
    write_pricing_layout,
)
from clinical_data_warehouse_bi_spark.registry import registered_oracles
from clinical_data_warehouse_bi_spark.session import get_spark


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = get_spark("bench-pricing-layout")
    big = replicate(spark, factor)
    table = f"lineitem_by_order_{factor}x"

    t0 = time.time()
    li = spark.read.parquet(f"{big}/lineitem.parquet")
    if not spark.catalog.tableExists(table):
        write_pricing_layout(li, table, num_buckets=32)
    layout_sec = round(time.time() - t0, 2)

    def bucketed(spark, _sf_dir):
        return pricing_summary_bucketed(spark, table)

    # value check first: the layout twin must be bit-identical
    a = {tuple(r) for r in q_pricing_summary(spark, big).collect()}
    b = {tuple(r) for r in bucketed(spark, big).collect()}
    assert a == b, "bucketed twin diverged from the exact form"

    # alternate variants within one process, twice each, best-of
    results = {"exact_parquet": [], "exact_bucketed": []}
    for _ in range(2):
        results["exact_parquet"].append(
            time_query(spark, q_pricing_summary, big)
        )
        results["exact_bucketed"].append(time_query(spark, bucketed, big))
    con = duck_con_for(big)
    duck = time_oracle(con, registered_oracles()["q_pricing_summary"])

    out = {
        "factor": factor,
        "layout_write_sec": layout_sec,
        "spark_exact_parquet": min(results["exact_parquet"]),
        "spark_exact_bucketed": min(results["exact_bucketed"]),
        "duckdb": duck,
        "ratio_parquet": round(min(results["exact_parquet"]) / duck, 2),
        "ratio_bucketed": round(min(results["exact_bucketed"]) / duck, 2),
        "values_equal": True,
        "host_load_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
