"""Phase profile of the pipeline_star bench entry: where does one
timed run() actually spend its wall-clock (round-16 verdict item 5 —
the fact-barrier zip_index_key was named the largest remaining
component; measure before touching).

Instruments keys.zip_index_key via a timing wrapper on
star.zip_index_key (records per-call wall time — the stats collect
inside is the blocking materialization) and times the two noop sinks
separately. Sources are cached exactly as bench.bench_pipeline does.

Usage: python scripts/profile_pipeline_star.py [sf] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_data_warehouse_bi_spark import star
from clinical_data_warehouse_bi_spark.fixtures import make_sources
from clinical_data_warehouse_bi_spark.io import (
    release_new_persistent_rdds,
    snapshot_persistent_rdds,
)
from clinical_data_warehouse_bi_spark.session import get_spark


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-pipeline-star")
    n_patients = max(120, int(12000 * sf))
    src = make_sources(spark, n_patients=n_patients)
    for df in src.values():
        df.cache().count()
    baseline = snapshot_persistent_rdds(spark)

    real_zip = star.zip_index_key
    calls: list[tuple[str, float]] = []

    def timed_zip(df, name="surrogate_id"):
        t0 = time.time()
        out = real_zip(df, name)
        calls.append((name, round(time.time() - t0, 3)))
        return out

    star.zip_index_key = timed_zip

    for rnd in range(n_rounds + 1):
        calls.clear()
        t0 = time.time()
        out = star.run_pipeline(src)
        t_build = time.time() - t0
        t1 = time.time()
        out["dwh"]["fact_disorder_events"].write.format("noop").mode(
            "overwrite"
        ).save()
        t_fact = time.time() - t1
        t2 = time.time()
        out["dwh"]["agg_disorders_per_admission"].write.format("noop").mode(
            "overwrite"
        ).save()
        t_agg = time.time() - t2
        total = time.time() - t0
        tag = "warmup" if rnd == 0 else f"round {rnd}"
        print(
            f"{tag}: total={total:.3f} build(lazy+stats)={t_build:.3f} "
            f"fact_sink={t_fact:.3f} agg_sink={t_agg:.3f} "
            f"zip_calls={calls}",
            flush=True,
        )
        release_new_persistent_rdds(spark, baseline)
    star.zip_index_key = real_zip
    spark.stop()


if __name__ == "__main__":
    main()
