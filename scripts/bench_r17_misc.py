"""Round-17 misc A/B probes, one process, alternating arms with
output equality asserted (see OPTIMIZATION_r17.md "Measurement
conditions"). Sub-probes:

census  — q_daily_census fan_out key: (unit, patient) [r16 current]
          vs (unit) alone. hash(unit) is a subset of BOTH downstream
          aggregate key sets ((unit, date, patient) distinct partial
          and the final (unit, date)), so the unit-keyed form elides
          the remaining mid-plan exchange: 2 Exchanges -> 1
          (guide §2.4). Skew check: units are TPC-H suppkeys —
          uniform, ~1000 distinct at sf0.1 (31x the partition count).
tfidf   — n_docs count from the un-fanned scan vs through the keyed
          fan_out: the count subtree needs no rebalance (a count is
          one cheap scan), so feeding it the raw relation drops one
          full-relation hash exchange from the plan (guide §2.4
          "Exchange nodes you did not expect").
corpusfp — build_corpus_release's dedup fingerprint as md5 hex vs a
          salted xxhash64 PAIR (same 128-bit collision budget,
          bigint columns instead of a 32-char string through the
          dedup window exchange; guide §2.3 narrower types).

Usage: python scripts/bench_r17_misc.py <census|tfidf|corpusfp> [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import text as T
from clinical_data_warehouse_bi_spark.io import fan_out, read_table
from clinical_data_warehouse_bi_spark.session import get_spark


def checksum(df: DataFrame):
    row_h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(row_h).alias("s")).collect()[0]
    return (r["n"], r["s"])


def ab_loop(arms: dict, n_rounds: int, check=checksum) -> None:
    sums = {name: check(fn()) for name, fn in arms.items()}
    print("checksums:", sums)
    assert len({str(v) for v in sums.values()}) == 1, "arms diverge — abort"
    times = {name: [] for name in arms}
    for rnd in range(n_rounds + 1):
        for name, fn in arms.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")


def probe_census(spark, sf_dir: str, n_rounds: int) -> None:
    from clinical_data_warehouse_bi_spark import kpi

    li = read_table(spark, sf_dir, "lineitem")

    def stays(*keys):
        return fan_out(li.select(
            F.col("l_suppkey").alias("careunit_id"),
            F.col("l_orderkey").alias("patient_id"),
            F.col("l_shipdate").cast("timestamp").alias("intime"),
            (
                F.col("l_shipdate")
                + F.make_dt_interval(days=F.col("l_linenumber"))
            ).cast("timestamp").alias("outtime"),
        ), *keys)

    ab_loop(
        {
            "A_unit_patient": lambda: kpi.daily_census(
                stays("careunit_id", "patient_id")
            ),
            "B_unit_only": lambda: kpi.daily_census(stays("careunit_id")),
        },
        n_rounds,
    )


def probe_tfidf(spark, sf_dir: str, n_rounds: int) -> None:
    docs = read_table(spark, sf_dir, "documents")

    def run(count_from_raw: bool):
        fanned = fan_out(docs, "doc_id")
        kwargs = {}
        if count_from_raw:
            kwargs["count_docs"] = docs
        return T.tfidf_keywords(fanned, k=5, **kwargs)

    ab_loop(
        {
            "A_count_thru_fanout": lambda: run(False),
            "B_count_from_raw": lambda: run(True),
        },
        n_rounds,
    )


def probe_corpusfp(spark, sf_dir: str, n_rounds: int) -> None:
    """Isolate the dedup stage of build_corpus_release: cleaned ->
    slim fingerprint -> keep-first window -> winners join-back."""
    from clinical_data_warehouse_bi_spark.queries.text_ops import (
        CLEAN_MIN_QUALITY,
        CLEAN_MIN_TOKENS,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    cleaned = T.remove_boilerplate(docs)
    qx = T.quality_exprs("text")

    def run(fp_cols):
        slim = cleaned.select(
            "doc_id",
            *fp_cols,
            qx["n_tokens"].alias("n_tokens"),
            qx["quality_score"].alias("q"),
        ).filter(
            (F.col("n_tokens") >= CLEAN_MIN_TOKENS)
            & (F.col("q") >= CLEAN_MIN_QUALITY)
        )
        fps = [c for c in slim.columns if c.startswith("__fp") or c == "fingerprint"]
        w = Window.partitionBy(*fps).orderBy("doc_id")
        winners = (
            slim.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id")
        )
        return cleaned.join(winners, "doc_id")

    ab_loop(
        {
            "A_md5": lambda: run(
                [F.md5(T.normalized_text("text")).alias("fingerprint")]
            ),
            "B_xxpair": lambda: run(
                [
                    F.xxhash64(T.normalized_text("text")).alias("__fp1"),
                    F.xxhash64(T.normalized_text("text"), F.lit("b")).alias(
                        "__fp2"
                    ),
                ]
            ),
        },
        n_rounds,
    )


def main() -> None:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(f"bench-r17-{which}")
    {
        "census": probe_census,
        "tfidf": probe_tfidf,
        "corpusfp": probe_corpusfp,
    }[which](spark, sf_dir, n_rounds)
    spark.stop()


if __name__ == "__main__":
    main()
