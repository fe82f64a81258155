"""A/B probes for the exact-substring family (round-17):

substring — q_substring_dedup (duplicate_spans w=1):
  A: current library form (no fan_out: the tokenize + per-window
     md5-of-joined-string explode pipelines onto the single-task
     local scan)
  B: library form behind fan_out(docs) (guide §2.6/§1: parallelize
     the heavy map-side hashing; exact no-op on a well-split scan)
  C: fan_out + window digest switched from md5(array_join(slice))
     hex string to a multi-arg xxhash64 PAIR over the window's token
     elements (guide §4.2/§2.3: no window-string allocation, 16-byte
     bigint pair instead of a 32-char string through the duplicate
     window exchange; 128-bit identity budget unchanged)

decontam — q_decontaminate_exact (probe_suffix_index):
  A: current library probe against the persisted md5 index
  B: probe side behind fan_out
  C: fan_out + xxhash64-pair digests probing a pair-format index
     (built untimed, mirroring the version-keyed rebuild the format
     bump triggers)

Output equality asserted between all arms every probe (spans are a
pure function of window CONTENT equality, so the digest swap changes
nothing modulo 128-bit collisions).

Usage: python scripts/bench_suffix_digest.py <substring|decontam> [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import suffix
from clinical_data_warehouse_bi_spark.io import fan_out, read_table
from clinical_data_warehouse_bi_spark.queries.dedup import SUBSTRING_MIN_TOKENS
from clinical_data_warehouse_bi_spark.session import get_spark
from clinical_data_warehouse_bi_spark.suffix import _merge_spans, _tok_rel

L = SUBSTRING_MIN_TOKENS


def _xx_window_rel(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h1, h2): xxhash64-pair digest per L-token window,
    hashed from the token ELEMENTS directly (length-prefixed per
    argument — the q_top_ngrams construction; no join/string alloc)."""
    elems = ", ".join(f"element_at(__toks, i + {j})" for j in range(L))
    win = F.expr(
        f"CASE WHEN size(__toks) >= {L} THEN "
        f"transform(sequence(1, size(__toks) - {L} + 1), "
        f"i -> struct(i AS pos, xxhash64({elems}) AS h1, "
        f"xxhash64({elems}, 'b') AS h2)) "
        "ELSE cast(array() AS array<struct<pos:int,h1:bigint,h2:bigint>>) END"
    )
    return (
        _tok_rel(docs, "doc_id", "text")
        .select("doc_id", F.explode(win).alias("__w"))
        .select(
            "doc_id",
            F.col("__w.pos").cast("bigint").alias("pos"),
            F.col("__w.h1").alias("h1"),
            F.col("__w.h2").alias("h2"),
        )
    )


def duplicate_spans_xx(docs: DataFrame) -> DataFrame:
    anchors = _xx_window_rel(docs)
    w_h = Window.partitionBy("h1", "h2")
    marked = (
        anchors.withColumn("__keep", F.count("*").over(w_h) >= 2)
        .filter(F.col("__keep"))
        .select("doc_id", "pos")
    )
    return _merge_spans(marked, L)


def checksum(df: DataFrame):
    row_h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(row_h).alias("s")).collect()[0]
    return (r["n"], r["s"])


def ab_loop(spark, arms: dict, n_rounds: int) -> None:
    from clinical_data_warehouse_bi_spark.io import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    sums = {}
    for name, fn in arms.items():
        base = snapshot_persistent_rdds(spark)
        sums[name] = checksum(fn())
        release_new_persistent_rdds(spark, base)
    print("checksums:", sums)
    assert len({str(v) for v in sums.values()}) == 1, "arms diverge — abort"
    times = {name: [] for name in arms}
    for rnd in range(n_rounds + 1):
        for name, fn in arms.items():
            base = snapshot_persistent_rdds(spark)
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_new_persistent_rdds(spark, base)
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")


def probe_substring(spark, sf_dir: str, n_rounds: int) -> None:
    docs = read_table(spark, sf_dir, "documents")
    ab_loop(
        spark,
        {
            "A_current": lambda: suffix.duplicate_spans(
                docs, min_tokens=L, winnow_w=1
            ),
            "B_fanout": lambda: suffix.duplicate_spans(
                fan_out(docs.select("doc_id", "text")), min_tokens=L,
                winnow_w=1,
            ),
            "C_fanout_xxpair": lambda: duplicate_spans_xx(
                fan_out(docs.select("doc_id", "text"))
            ),
        },
        n_rounds,
    )


def probe_decontam(spark, sf_dir: str, n_rounds: int) -> None:
    docs = read_table(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 4 == 0)
    probe_docs = docs.where(F.col("doc_id") % 4 != 0).select("doc_id", "text")

    md5_idx = tempfile.mkdtemp(prefix="sfx-md5-")
    shutil.rmtree(md5_idx)
    suffix.build_suffix_index(ref, md5_idx, min_tokens=L, n_buckets=32)

    # xx-pair index (untimed build, the version-bump rebuild)
    xx_idx = tempfile.mkdtemp(prefix="sfx-xx-")
    n_buckets = 32
    rel = _xx_window_rel(fan_out(ref.select("doc_id", "text")))
    (
        rel.select("h1", "h2")
        .distinct()
        .withColumn(
            "bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(xx_idx)
    )

    def probe_xx(new_docs):
        probe = (
            _xx_window_rel(new_docs)
            .withColumn(
                "bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int")
            )
            .localCheckpoint()
        )
        buckets = [
            r["bucket"] for r in probe.select("bucket").distinct().collect()
        ]
        idx = spark.read.parquet(xx_idx).where(F.col("bucket").isin(buckets))
        marked = probe.join(idx, ["bucket", "h1", "h2"], "left_semi").select(
            "doc_id", "pos"
        )
        return _merge_spans(marked, L)

    try:
        ab_loop(
            spark,
            {
                "A_current": lambda: suffix.probe_suffix_index(
                    spark, probe_docs, md5_idx
                ),
                "B_fanout": lambda: suffix.probe_suffix_index(
                    spark, fan_out(probe_docs), md5_idx
                ),
                "C_fanout_xxpair": lambda: probe_xx(fan_out(probe_docs)),
            },
            n_rounds,
        )
    finally:
        shutil.rmtree(md5_idx, ignore_errors=True)
        shutil.rmtree(xx_idx, ignore_errors=True)


def main() -> None:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(f"bench-suffix-{which}")
    {"substring": probe_substring, "decontam": probe_decontam}[which](
        spark, sf_dir, n_rounds
    )
    spark.stop()


if __name__ == "__main__":
    main()
