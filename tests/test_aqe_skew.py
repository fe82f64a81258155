"""AQE runtime re-planning evidence: the session factory turns on
adaptive skew-join splitting (session.py), and joins.salted_join
exists for the cases AQE cannot see. This test proves the AQE path
actually engages on this build — a skewed sort-merge join's FINAL
adaptive plan must mark the skewed side split (skew=true) — so the
100 TB skew story is (a) AQE first, (b) salting where AQE can't
reach (e.g. aggregations), with both halves verified rather than
asserted."""

from __future__ import annotations

from pyspark.sql import functions as F


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
