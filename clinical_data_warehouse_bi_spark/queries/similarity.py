"""Similarity search over `embeddings` (north-star extensions):
brute-force cosine top-k as the exactness baseline, IVF-style
bucketed search as the scale path.

Numeric-parity design: dot products are computed as a sequential
left-fold in BOTH engines (Spark `aggregate()` over the array;
DuckDB `list_dot_product`) so the double summation order matches;
ranking uses round(cos, 6) with the neighbor id as tiebreak so a
hypothetical 1-ulp divergence cannot flip the compared output."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.io import load_tables
from clinical_data_warehouse_bi_spark.registry import register

#: number of query vectors / centroids / neighbors (tiny, fixed demo sizes)
N_QUERIES = 8
N_CENTROIDS = 4
TOP_K = 10

_SQL_VECS = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS n2
  FROM embeddings
"""


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        e.alias("e"),
        F.aggregate(
            F.zip_with(e, e, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        ).alias("n2"),
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@register("q_cosine_topk", oracle=f"""
    WITH n AS ({_SQL_VECS}),
    q AS (SELECT vec_id AS qid, e AS qe, n2 AS qn2 FROM n
          WHERE vec_id < {N_QUERIES}),
    p AS (SELECT q.qid, c.vec_id AS nid,
                 list_dot_product(q.qe, c.e) / (sqrt(q.qn2) * sqrt(c.n2)) AS cos
          FROM q, n c WHERE c.vec_id <> q.qid)
    SELECT qid, nid, rank, round(cos, 4) AS cosine
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, nid ASC) AS rank
          FROM p)
    WHERE rank <= {TOP_K}
    """)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: each of the first
    {N_QUERIES} vectors against the whole table. The query side is a
    broadcast; the scan side never shuffles; per-partition top-k then
    a k-row merge (TakeOrdered pattern via row_number window on qid —
    qid has only N_QUERIES values, fine here; at billions of
    candidates switch the window to a repartition-by-qid + partial
    top-k, or the numpy mapInPandas path in similarity-module docs)."""
    n = _vectors(spark, sf_dir)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("n2").alias("qn2")
    )
    p = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                _dot(F.col("qe"), F.col("e"))
                / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("n2")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cos"), 6).desc(), F.col("nid").asc())
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


@register("q_ann_ivf", oracle=f"""
    WITH n AS ({_SQL_VECS}),
    cent AS (SELECT vec_id AS cid, e AS ce, n2 AS cn2 FROM n
             WHERE vec_id < {N_CENTROIDS}),
    assign AS (
      SELECT vec_id, cid AS bucket FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(v.e, c.ce)
                               / (sqrt(v.n2) * sqrt(c.cn2)), 6) DESC,
                          c.cid ASC) AS rn
        FROM n v, cent c)
      WHERE rn = 1),
    q AS (SELECT v.vec_id AS qid, v.e AS qe, v.n2 AS qn2, a.bucket
          FROM n v JOIN assign a ON a.vec_id = v.vec_id
          WHERE v.vec_id < {N_QUERIES}),
    p AS (SELECT q.qid, v.vec_id AS nid,
                 list_dot_product(q.qe, v.e) / (sqrt(q.qn2) * sqrt(v.n2)) AS cos
          FROM q
          JOIN assign a ON a.bucket = q.bucket
          JOIN n v ON v.vec_id = a.vec_id
          WHERE v.vec_id <> q.qid)
    SELECT qid, nid, rank, round(cos, 4) AS cosine
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, nid ASC) AS rank
          FROM p)
    WHERE rank <= 5
    """)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN (the scale path): assign every vector to
    its nearest of {N_CENTROIDS} deterministic centroids (here: the
    first vectors; k-means at scale), then search only the query's
    bucket. Turns O(N*Q) brute force into O(N/buckets * Q) with a
    shuffle keyed on bucket id. Same portable-cosine machinery as
    q_cosine_topk."""
    n = _vectors(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("n2").alias("cn2")
    )
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(
            _dot(F.col("e"), F.col("ce")) / (F.sqrt(F.col("n2")) * F.sqrt(F.col("cn2"))),
            6,
        ).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    assign = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("bucket"))
    )
    q = (
        n.join(assign, "vec_id")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.col("n2").alias("qn2"),
            "bucket",
        )
    )
    cand = assign.select(F.col("vec_id").alias("cand_id"), F.col("bucket").alias("cb"))
    p = (
        q.join(cand, F.col("bucket") == F.col("cb"))
        .join(n, F.col("cand_id") == n["vec_id"])
        .filter(F.col("cand_id") != F.col("qid"))
        .select(
            "qid",
            F.col("cand_id").alias("nid"),
            (
                _dot(F.col("qe"), F.col("e"))
                / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("n2")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cos"), 6).desc(), F.col("nid").asc())
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


#: demo near-dup threshold for the synthetic random embeddings (real
#: pipelines use ~0.95; the driver's vectors are near-orthogonal so a
#: production threshold would select nothing to compare)
NEAR_DUP_COS = 0.3

_SQL_SIGN_BUCKET = " + ".join(
    f"(CASE WHEN e[{i + 1}] >= 0 THEN {1 << (7 - i)} ELSE 0 END)" for i in range(8)
)


@register("q_embed_near_dup", oracle=f"""
    WITH n AS ({_SQL_VECS}),
    b AS (SELECT vec_id, e, n2, {_SQL_SIGN_BUCKET} AS bucket FROM n),
    p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                 list_dot_product(a.e, c.e) / (sqrt(a.n2) * sqrt(c.n2)) AS cos
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
    SELECT vec_a, vec_b, round(cos, 4) AS cosine
    FROM p WHERE round(cos, 6) >= {NEAR_DUP_COS}
    """)
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, LSH-bucketed: block
    vectors by the sign pattern of their first 8 dimensions (random-
    hyperplane LSH with axis-aligned hyperplanes — deterministic and
    engine-portable), then verify cosine >= threshold ONLY within
    blocks. The bucket equi-join is the scale path: one shuffle keyed
    on an 8-bit bucket id, never an all-pairs product; recall is
    tuned by band count exactly as in MinHash LSH (q_minhash_lsh_pairs).
    Rounded before thresholding so a hypothetical 1-ulp divergence
    cannot flip membership."""
    n = _vectors(spark, sf_dir)
    bucket = None
    for i in range(8):
        bit = F.when(F.element_at("e", i + 1) >= 0, F.lit(1 << (7 - i))).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    b = n.withColumn("bucket", bucket)
    a = b.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
                 F.col("n2").alias("na"), "bucket")
    c = b.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                 F.col("n2").alias("nb"), F.col("bucket").alias("cb"))
    return (
        a.join(c, (F.col("bucket") == F.col("cb")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            (
                _dot(F.col("ea"), F.col("eb"))
                / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
            ).alias("cos"),
        )
        .filter(F.round("cos", 6) >= F.lit(NEAR_DUP_COS))
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )
