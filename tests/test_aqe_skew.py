"""AQE runtime re-planning evidence: the session factory turns on
adaptive skew-join splitting (session.py), and joins.salted_join
exists for the cases AQE cannot see. This test proves the AQE path
actually engages on this build — a skewed sort-merge join's FINAL
adaptive plan must mark the skewed side split (skew=true) — so the
100 TB skew story is (a) AQE first, (b) salting where AQE can't
reach (e.g. aggregations), with both halves verified rather than
asserted."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
def test_aqe_splits_skewed_join(spark):
    """One key owning ~90% of a large fact side must be split by
    AQE's OptimizeSkewedJoin in the final adaptive plan."""
    # fresh session settings scoped to this test
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_factor = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    )
    old_size = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    old_advise = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(0, 3_000).select(
            F.col("id").alias("rk"), F.lit("dim").alias("d")
        )
        joined = left.join(right, left["k"] == right["rk"]).select("k", "d")
        # execute THIS Dataset (a writer executes a copy of the plan,
        # leaving this QueryExecution's AQE un-finalized)
        n = len(joined.collect())
        assert n > 300_000  # the hot key really fans out
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final[:500]
        assert "skew=true" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", old_factor
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            old_size,
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", old_advise
        )


@pytest.mark.slow
def test_runtime_bloom_filter_join_engages(spark, tmp_path):
    """Second half of the runtime-filtering story: Spark's runtime
    BLOOM FILTER injection (on by default in this build — verified,
    not assumed) plants a bloom_filter_might_contain predicate on
    the large scan side of a shuffle join whose other side carries a
    selective filter — at 100 TB that prunes most of the fact scan's
    rows before the shuffle. This proves it engages under the
    session factory's settings, and that the filtered join's result
    is untouched by the rewrite."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )
    try:
        d = str(tmp_path)
        spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).write.mode("overwrite").parquet(d + "/fact")
        spark.range(0, 20_000).select(
            F.col("id").alias("rk"), (F.col("id") % 100).alias("cat")
        ).write.mode("overwrite").parquet(d + "/dim")
        fact = spark.read.parquet(d + "/fact")
        dim = spark.read.parquet(d + "/dim").filter("cat = 7")
        j = fact.join(dim, F.col("k") == F.col("rk"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        # semantics untouched: k = rk in [7, 107, ...] (cat = 7)
        got = sorted(r.k for r in j.collect())
        want = sorted(k for k in range(7, 20_000, 100))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_app,
        )
