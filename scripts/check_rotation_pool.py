"""Gate-scale oracle check for EVERY rotation-pool retiree.

The round-13 slot rotation (registry.ROTATION_POOL) cycles 5 retired
queries per round back through the driver's hard CORRECTNESS gate;
this script runs the full pool against DuckDB at the gate scale so a
future round's batch can never surprise the driver — run it after
touching any retiree or shared helper. Round-13 baseline: 0 failed
of 35 at sf0.01.

Usage: python scripts/check_rotation_pool.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import duckdb

from clinical_data_warehouse_bi_spark.io import DRIVER_TABLES
from clinical_data_warehouse_bi_spark.registry import (
    ROTATION_POOL,
    _resolve_spec,
)
from clinical_data_warehouse_bi_spark.session import get_spark


def main() -> int:
    from test_oracle_parity import _normalize

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("rotation-pool-gate")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = 0
    for spec in ROTATION_POOL:
        q = _resolve_spec(spec)
        t0 = time.time()
        try:
            s_cols, s_rows = _normalize(q.fn(spark, sf).toPandas())
            d_cols, d_rows = _normalize(con.execute(q.oracle).df())
            ok = s_cols == d_cols and s_rows == d_rows
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"ERROR {spec.name}: {e}")
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'} {spec.name} [{time.time() - t0:.1f}s]")
    print(f"{fails} failed of {len(ROTATION_POOL)}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
