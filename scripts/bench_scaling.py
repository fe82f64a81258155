"""Scale-up probe: run headline queries against an N-fold replica of
the sf0.1 tables and report t(Nx)/t(1x) per query.

The driver's correctness gate runs at small sf; this script is the
evidence the plans behave at volume: a query whose shape is right
(map-side work + slim shuffles + broadcast dims) should scale
SUB-linearly locally (fixed job overhead amortizes, 32 cores stay
busy longer), while an accidentally quadratic or driver-bound plan
blows past Nx. Results are recorded per round in BASELINE.md.

Replication keeps every distribution shape: keys are shifted by
replica * (max_key + 1) so join fan-outs, group sizes per key, and
dedup cluster sizes stay IDENTICAL to the base table — the row count
scales, the per-key skew does not (the honest scale-up; naive
UNION-without-reshift would multiply group sizes instead, conflating
volume with skew).

Usage: python scripts/bench_scaling.py [factor] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.registry import all_queries
from clinical_data_warehouse_bi_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale"

#: key columns to shift per replica so per-key cardinalities are
#: preserved exactly (referential integrity included: lineitem's
#: orderkey shifts in lockstep with orders')
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": [],
    "part": [],
    "region": [],
    "nation": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "q_agg_per_order",
    "q_pricing_summary",
    "q_join_lookup_cast",
    "q_asof_next_order",
    "q_corpus_clean",
    "q_minhash_lsh_pairs",
    "q_chunk_dedup",
    "q_lm_perplexity",
    "q_cosine_topk",
    "q_funnel_steps",
]


def replicate(spark, factor: int) -> str:
    out = f"{OUT}_{factor}x"
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t, keys in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        if factor > 1 and keys:
            span = {
                k: (df.agg(F.max(k)).first()[0] or 0) + 1 for k in keys
            }
            parts = []
            for r in range(factor):
                p = df
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(r * span[k]))
                parts.append(p)
            reps = parts[0]
            for p in parts[1:]:
                reps = reps.unionByName(p)
        else:
            # keyless dims (supplier/part/region/nation) keep their
            # identity: replicating them would break FK semantics,
            # and the queries treat them as broadcast dims anyway
            reps = df
        reps.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    open(marker, "w").write("ok")
    return out


def time_query(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("bench-scaling")
    from clinical_data_warehouse_bi_spark.io import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    big_dir = replicate(spark, factor)
    # registry-retired operators remain probe-able via direct import
    # (the bench.py convention)
    from clinical_data_warehouse_bi_spark.queries.core import (
        q_agg_per_order,
        q_approx_stats,
        q_sentinel_timestamps,
    )
    from clinical_data_warehouse_bi_spark.queries.dedup import (
        q_chunk_dedup,
        q_minhash_lsh_pairs,
        q_paragraph_dedup,
    )
    from clinical_data_warehouse_bi_spark.queries.join_ops import q_range_join
    from clinical_data_warehouse_bi_spark.queries.similarity import q_cosine_topk
    from clinical_data_warehouse_bi_spark.queries.windows import (
        q_frame_sample,
        q_scd2_dim,
    )

    queries = {
        **all_queries(),
        "q_chunk_dedup": q_chunk_dedup,
        "q_paragraph_dedup": q_paragraph_dedup,
        "q_approx_stats": q_approx_stats,
        "q_sentinel_timestamps": q_sentinel_timestamps,
        "q_range_join": q_range_join,
        "q_frame_sample": q_frame_sample,
        "q_agg_per_order": q_agg_per_order,
        "q_cosine_topk": q_cosine_topk,
        "q_minhash_lsh_pairs": q_minhash_lsh_pairs,
        "q_scd2_dim": q_scd2_dim,
    }
    baseline = snapshot_persistent_rdds(spark)
    rows = []
    for name in names:
        fn = queries[name]
        spark.catalog.clearCache()
        release_new_persistent_rdds(spark, baseline)
        t1 = time_query(spark, fn, BASE)
        spark.catalog.clearCache()
        release_new_persistent_rdds(spark, baseline)
        tn = time_query(spark, fn, big_dir)
        ratio = round(tn / t1, 2) if t1 > 0 else None
        rows.append([name, t1, tn, ratio])
        print(
            f"{name:28s} 1x={t1:7.3f}s {factor}x={tn:7.3f}s"
            f" ratio={ratio}",
            file=sys.stderr,
        )
    print(json.dumps({"factor": factor, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
