"""A/B probe: remove_boilerplate's line identity as md5 hex-pair vs
xxhash64 bigint-pair (round-17 optimization candidate, guide §2.3
"narrower types" + cheaper per-row hashing).

Hypothesis: the md5 pair costs two full MD5 digests + two 32-char hex
string allocations per line in BOTH corpus passes (count + rebuild),
and the rebuild probes an array of 64-char strings per line. xxhash64
returns a bigint for a fraction of the CPU, the counting exchange
narrows from ~72 bytes/row of hash text to 16, and the rebuild's
array_contains compares 128-bit structs instead of 64-char strings.
Line-identity semantics are unchanged (same-pair iff same line text,
modulo 128-bit collisions — the q_top_ngrams/q_repeated_spans hazard
budget, accepted there since round 11).

Protocol: one process, alternating A (md5, current) / B (xxhash64),
best-of-N after a discarded warm-up round, order-insensitive
checksum equality asserted between arms every round.

Usage: python scripts/bench_boilerplate_hash.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import text as T
from clinical_data_warehouse_bi_spark.io import fan_out, read_table
from clinical_data_warehouse_bi_spark.session import get_spark


def remove_boilerplate_xx(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 3,
) -> DataFrame:
    """text.remove_boilerplate with the line identity switched from
    (md5(x), md5('b:'||x)) hex strings to (xxhash64(x),
    xxhash64('b:', x)) bigints — otherwise line-for-line the library
    implementation."""
    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> length(trim(x)) > 0)")
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("__src"),
        lines.alias("__lines"),
    )
    hashed = base.select(
        "__id",
        "__src",
        F.explode(
            F.expr(
                "transform(__lines,"
                " x -> named_struct('h1', xxhash64(x), 'h2', xxhash64('b:', x)))"
            )
        ).alias("hp"),
    ).select("__id", "__src", F.col("hp.h1").alias("h1"), F.col("hp.h2").alias("h2"))
    per_line = hashed.distinct().groupBy("__src", "h1", "h2").agg(
        F.count("*").alias("n_docs_with")
    )
    per_src = base.groupBy("__src").agg(F.count("*").alias("n_docs"))
    boiler = (
        per_line.join(F.broadcast(per_src), "__src")
        .where(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_docs_with") > F.lit(min_frac) * F.col("n_docs"))
        )
        .select("__src", "h1", "h2")
    )
    boiler_sets = boiler.groupBy("__src").agg(
        F.collect_set(F.expr("named_struct('h1', h1, 'h2', h2)")).alias("__bl")
    )
    out_cols = [c for c in docs.columns if c != text_col]
    enriched = docs.withColumn("__lines", lines).withColumn(
        "__src", F.col(source_col)
    )
    return (
        enriched.join(F.broadcast(boiler_sets), "__src", "left")
        .withColumn(
            "__clean_lines",
            F.expr(
                "IF(__bl IS NULL, __lines,"
                " filter(__lines, x -> NOT array_contains("
                "   __bl, named_struct('h1', xxhash64(x), 'h2', xxhash64('b:', x)))))"
            ),
        )
        .select(
            *out_cols,
            F.expr("array_join(__clean_lines, '\\n')").alias(text_col),
            (F.size("__lines") - F.size("__clean_lines"))
            .cast("bigint")
            .alias("n_removed_lines"),
        )
    )


def q_shape(docs: DataFrame, *keys: str) -> DataFrame:
    """Mirror q_boilerplate's registered staging (multi-line derive).
    ``keys`` forwards to fan_out: keyed-by-doc_id is the round-17
    probe (doc_id is a member of the counting distinct's
    (__id, __src, h1, h2) key set, so hash partitioning on it
    satisfies the distinct's clustering requirement and the
    post-explode exchange is elided)."""
    staged = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("HEADER "),
            F.col("source"),
            F.lit("\n"),
            F.regexp_replace("text", " ", "\n"),
        ).alias("text"),
    )
    return fan_out(staged, *keys)


def checksum(df: DataFrame):
    """Order-insensitive full-content checksum: count + decimal sum of
    a per-row hash over every output column."""
    row_h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    r = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(row_h).alias("s")
    ).collect()[0]
    return (r["n"], r["s"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("bench-boilerplate-hash")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def run_a():
        return T.remove_boilerplate(q_shape(docs), min_frac=0.5, min_docs=3)

    def run_b():
        return remove_boilerplate_xx(q_shape(docs), min_frac=0.5, min_docs=3)

    def run_c():
        return remove_boilerplate_xx(
            q_shape(docs, "doc_id"), min_frac=0.5, min_docs=3
        )

    # output equality once up front (checksum over every column)
    ca, cb, cc = checksum(run_a()), checksum(run_b()), checksum(run_c())
    print(f"checksum A={ca} B={cb} C={cc} equal={ca == cb == cc}")
    assert ca == cb == cc, "arms diverge — abort"

    times = {"A_md5": [], "B_xxhash": [], "C_xx_keyed": []}
    for rnd in range(n_rounds + 1):  # round 0 = discarded warm-up
        for name, fn in (
            ("A_md5", run_a), ("B_xxhash", run_b), ("C_xx_keyed", run_c)
        ):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
