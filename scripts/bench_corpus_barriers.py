"""A/B probe: build_corpus_release with vs without materialization
barriers (round-16 optimization candidate).

Hypothesis (guide section 5, caching for reuse): the release pipeline
runs THREE actions per invocation (release.count, the mix's size
collect, the chunk write) and several operators traverse their input
more than once (winners + join over `cleaned`; strip_duplicate_spans'
anchors + SA tier + token rebuild over the pre-strip release), so the
boilerplate/quality/dedup/decontaminate chain is recomputed many
times per run. localCheckpoint barriers at the reuse points should
collapse that to one computation each.

Protocol: one process, alternating A (current) / B (barriered),
best-of-N each, identical output checked by row count + id-set.

Usage: python scripts/bench_corpus_barriers.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_data_warehouse_bi_spark.corpus import build_corpus_release
from clinical_data_warehouse_bi_spark.io import (
    read_table,
    release_new_persistent_rdds,
    snapshot_persistent_rdds,
)
from clinical_data_warehouse_bi_spark.session import get_spark


def timed_run(spark, docs, baseline, **kwargs) -> tuple[float, int, int]:
    t0 = time.time()
    r = build_corpus_release(spark, docs, **kwargs)
    r["chunks"].write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    n_chunks = r["chunks"].count()
    release_new_persistent_rdds(spark, baseline)
    return dt, r["n_release"], n_chunks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-corpus-barriers")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # full variant mirrors bench.bench_corpus_full (decontaminate +
    # substring dedup) but builds the index fresh under /tmp
    import shutil
    import tempfile

    from clinical_data_warehouse_bi_spark.suffix import build_suffix_index

    ref = docs.filter("doc_id % 50 = 0")
    corpus_docs = docs.filter("doc_id % 50 != 0")
    idx = tempfile.mkdtemp(prefix="barrier-idx-")
    shutil.rmtree(idx, ignore_errors=True)
    build_suffix_index(ref, idx, min_tokens=12, n_buckets=64)
    baseline = snapshot_persistent_rdds(spark)

    variants = {
        "plain": dict(),
        "full": dict(decontaminate_index=idx, substring_dedup=True),
    }
    for vname, kwargs in variants.items():
        results: dict[str, list[float]] = {"A_current": [], "B_barrier": []}
        anchors = {}
        for rnd in range(n_rounds + 1):  # +1 warm-up round (discarded)
            for label, flag in (("A_current", False), ("B_barrier", True)):
                dt, n_rel, n_chunks = timed_run(
                    spark, corpus_docs if vname == "full" else docs,
                    baseline, materialize=flag, **kwargs,
                )
                anchors.setdefault(label, (n_rel, n_chunks))
                assert anchors[label] == (n_rel, n_chunks)
                if rnd > 0:
                    results[label].append(dt)
        a0 = anchors.get("A_current")
        b0 = anchors.get("B_barrier")
        # counts-only comparison (n_release + chunk rows); the
        # row-level id-set mirror lives in
        # tests/test_corpus_pipeline.py::test_release_barriers_equal_unmaterialized.
        # ASSERTED, not just printed (round-16 advice): a perf win
        # with divergent output must abort the record.
        assert a0 == b0, (a0, b0)
        print(
            f"[{vname}] anchors A={a0} B={b0} equal={a0 == b0}\n"
            f"[{vname}] A_current best={min(results['A_current']):.3f} "
            f"all={[round(x,3) for x in results['A_current']]}\n"
            f"[{vname}] B_barrier best={min(results['B_barrier']):.3f} "
            f"all={[round(x,3) for x in results['B_barrier']]}",
            flush=True,
        )
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
