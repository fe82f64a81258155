"""Graph operators for deduplication cluster assembly.

The reference's dedup surface ends at pair detection (DISTINCT
promotion, DWH.sql:111-118; the LSH/SimHash pipelines extend it to
near-dup PAIRS). A training-data pipeline needs one more step: group
the pairs into CLUSTERS and pick one canonical representative per
cluster — connected components over the candidate-pair graph.

Spark-first realization: iterative min-label propagation on
DataFrames. Each vertex starts labeled with its own id; every
iteration each vertex takes the min of its label and its neighbors'
labels; fixpoint = every vertex labeled with its component's minimum
id. Convergence is O(component diameter) iterations — near-dup
clusters are shallow (duplicates of a common ancestor), so 2-4
rounds in practice.

100 TB notes:
- per iteration: ONE shuffle pair (edge join on dst + groupBy src),
  both keyed on vertex id, so AQE reuses/co-partitions the exchange;
  skewed hub vertices are AQE-split.
- lineage is truncated every iteration (localCheckpoint) — without
  it the plan doubles per round and the driver, not the data,
  becomes the bottleneck (the standard iterative-algorithm idiom,
  same barrier RDD-based iterative jobs use).
- for graphs with deep chains (not the dedup shape), the
  alternating large-star/small-star algorithm (Kiveris et al.)
  converges in O(log n) rounds with the same per-round plan; the
  label-propagation loop here is the simple special case that is
  optimal for shallow duplicate clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component): each vertex labeled with the smallest vertex
    id reachable from it over the undirected ``edges``.

    ``vertices`` (optional) adds isolated vertices — every id there
    appears in the output even with no incident edge (its own
    singleton component). Raises after ``max_iter`` rounds without a
    fixpoint (a diameter that large means the input is not the
    shallow dedup-cluster shape this loop is tuned for — use a
    large-star/small-star variant instead)."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    base = sym.select(F.col("s").alias("id"))
    if vertices is not None:
        base = base.unionByName(vertices.select(F.col(vertex_col).alias("id")))
    labels = base.distinct().select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["d"] == labels["id"])
            .groupBy("s")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["s"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate per-iteration lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_iter} iterations —"
        " component diameter exceeds the shallow dedup-cluster shape; use an"
        " alternating large-star/small-star pass instead"
    )
