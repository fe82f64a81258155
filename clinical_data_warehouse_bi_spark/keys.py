"""Surrogate-key strategies (SURVEY.md section 2.5, W1/W2).

The reference uses `ROW_NUMBER() OVER ()` (Stage_area.sql:58) and
MariaDB AUTO_INCREMENT (Stage_area.sql:77,154,263; DWH.sql:99). Spark
has no auto-increment; two strategies:

- ``row_number_key``: exact, contiguous, deterministic given an
  ORDER BY — but a global window collapses to ONE partition. Fine for
  dimension tables (thousands of rows); never for the fact table.
- ``distributed_key``: `monotonically_increasing_id()` — unique,
  non-contiguous, fully parallel (partition id in the high bits).
  The 100 TB path for fact surrogate keys.
- ``zip_index_key``: contiguous AND distributed: per-partition counts
  + offset cumsum, one extra tiny job. Use when downstream genuinely
  needs dense keys at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def row_number_key(order_by: list[str | Column]) -> Column:
    """W1: dense surrogate key; single-partition — dims only."""
    return F.row_number().over(Window.orderBy(*order_by))


def distributed_key() -> Column:
    """W2 at scale: unique, sparse, shuffle-free."""
    return F.monotonically_increasing_id()


def zip_index_key(df: DataFrame, name: str = "surrogate_id") -> DataFrame:
    """Dense 1..N key without a global sort: spark_partition_id ->
    per-partition row_number + precomputed partition offsets (small
    driver-side map, broadcast automatically)."""
    part = F.spark_partition_id()
    with_part = df.withColumn("__pid", part)
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_part.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__pid")
    )
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    return (
        with_part.withColumn(name, F.row_number().over(w) + offset_col)
        .drop("__pid")
    )
