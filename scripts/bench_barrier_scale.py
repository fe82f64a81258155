"""Round-16 verdict items 6 and 7 — measurements at replica scale:

barriers  — corpus barrier memory/spill audit at 16x/64x (guide §5):
            build_corpus_release with materialize=True vs False on an
            N-fold replicated documents table; records wall-clock,
            the checkpointed RDDs' storage bytes (memory vs DISK —
            disk bytes on a MEMORY_AND_DISK checkpoint ARE the spill
            signal), and output equality between arms.

tokonce   — strip_duplicate_spans materialize_tokens re-measure at
            planted-corpus scale (the r16 rejection was at sf0.1
            where tokenization is cheap; the knob could win where
            the corpus is big enough that three tokenize passes
            outweigh the array<string> checkpoint).

Usage:
  python scripts/bench_barrier_scale.py barriers <factor> [n_rounds]
  python scripts/bench_barrier_scale.py tokonce <factor> [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.corpus import build_corpus_release
from clinical_data_warehouse_bi_spark.io import (
    release_new_persistent_rdds,
    snapshot_persistent_rdds,
)
from clinical_data_warehouse_bi_spark.session import get_spark


def rdd_storage(spark) -> tuple[int, int]:
    """(memory bytes, disk bytes) across currently stored RDDs."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return (
        sum(i.memSize() for i in infos),
        sum(i.diskSize() for i in infos),
    )


def probe_barriers(spark, factor: int, n_rounds: int) -> None:
    from scripts.bench_scaling import replicate

    src = replicate(spark, factor)
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    baseline = snapshot_persistent_rdds(spark)

    def run(materialize: bool):
        r = build_corpus_release(spark, docs, materialize=materialize)
        r["chunks"].write.format("noop").mode("overwrite").save()
        n_chunks = r["chunks"].count()
        mem, disk = rdd_storage(spark)
        return r["n_release"], n_chunks, mem, disk

    results = {}
    times = {"A_materialize": [], "B_plain": []}
    for rnd in range(n_rounds + 1):
        for name, mat in (("A_materialize", True), ("B_plain", False)):
            t0 = time.time()
            out = run(mat)
            dt = time.time() - t0
            release_new_persistent_rdds(spark, baseline)
            results.setdefault(name, out[:2])
            assert results[name] == out[:2], (results[name], out[:2])
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(
                f"round {rnd} {name}: {dt:.3f}s n_release={out[0]} "
                f"chunks={out[1]} storage_mem={out[2]/1e6:.1f}MB "
                f"storage_disk={out[3]/1e6:.1f}MB",
                flush=True,
            )
    assert results["A_materialize"] == results["B_plain"], results
    print(f"factor={factor} outputs equal: {results['A_materialize']}")
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")


def probe_tokonce(spark, factor: int, n_rounds: int) -> None:
    from clinical_data_warehouse_bi_spark.suffix import strip_duplicate_spans
    from scripts.bench_scaling import replicate_planted

    src = replicate_planted(spark, factor)
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "text"
    )
    baseline = snapshot_persistent_rdds(spark)

    def run(mat_tokens: bool):
        out = strip_duplicate_spans(
            docs, min_tokens=12, winnow_w=8, keep_first=True,
            materialize_tokens=mat_tokens,
        )
        out.write.format("noop").mode("overwrite").save()
        n, s = (
            out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("text")).alias("s"),
            ).collect()[0]
        )
        return n, s

    eq = {}
    times = {"A_retokenize": [], "B_tok_once": []}
    for rnd in range(n_rounds + 1):
        for name, mat in (("A_retokenize", False), ("B_tok_once", True)):
            t0 = time.time()
            out = run(mat)
            dt = time.time() - t0
            release_new_persistent_rdds(spark, baseline)
            eq.setdefault(name, out)
            assert eq[name] == out, (eq[name], out)
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s out={out}", flush=True)
    assert eq["A_retokenize"] == eq["B_tok_once"], eq
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")


def main() -> None:
    which = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(f"bench-barrier-{which}")
    {"barriers": probe_barriers, "tokonce": probe_tokonce}[which](
        spark, factor, n_rounds
    )
    spark.stop()


if __name__ == "__main__":
    main()
