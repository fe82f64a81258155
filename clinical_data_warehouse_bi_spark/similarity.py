"""Similarity-search engine pieces beyond the oracle-checked queries
(queries/similarity.py): the Arrow-batched numpy path for brute-force
top-k, and an MLlib-KMeans IVF index for learned partitioning.

Why a second implementation of cosine top-k: the SQL-expression form
(F.aggregate fold over arrays) is portable and oracle-checkable, but
folds element-by-element inside codegen. At real embedding scale
(billions of vectors x hundreds of dims) the winning shape is a
matrix multiply over Arrow-delivered batches — numpy BLAS does
batch_rows x dims @ dims x n_queries in one GEMM per batch. That is
exactly what mapInPandas gives us WITHOUT leaving Spark's execution
model: scan partitions stream in as pandas frames, each emits its
partial top-k, and a final tiny reduce merges k rows per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "qid long, nid long, cos double"


def cosine_topk_numpy(vectors: DataFrame, queries: list[tuple[int, list[float]]],
                      k: int = 10) -> DataFrame:
    """Brute-force cosine top-k via numpy GEMM inside mapInPandas.

    ``vectors``: (vec_id, embedding array<float>). ``queries``: small
    driver-side list [(qid, vector)] — broadcast into every task via
    closure capture (Arrow-serialized once per executor).

    Plan shape: scan -> mapInPandas (partition-local GEMM + partial
    top-k, output k rows per query per partition) -> global top-k
    window over the tiny partial set. No shuffle of the vector table,
    ever; the only exchanged data is |partitions| x |queries| x k
    rows."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)  # Q x D
    qnorm = np.linalg.norm(qmat, axis=1)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)  # N x D
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qmat.T) / np.outer(norms, qnorm)  # N x Q
            out = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                mask = ids != qid  # exclude self-match
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                # partial top-k under the SAME total order the final
                # window uses — (round(cos, 6) desc, nid asc) — so the
                # global top-k of per-partition top-ks is exactly the
                # top-k of the union (a raw-cos partial order could
                # drop a row that wins a rounded tie by neighbor id)
                order = np.lexsort(
                    (ids[cand_idx], -np.round(col[cand_idx], 6))
                )
                top = cand_idx[order[:k]]
                out.append(pd.DataFrame({
                    "qid": qid, "nid": ids[top], "cos": col[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = vectors.select("vec_id", "embedding").mapInPandas(op, TOPK_SCHEMA)
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("nid").asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


def pairwise_cosine(
    pairs: DataFrame,
    id_cols: tuple[str, str],
    vec_cols: tuple[str, str],
    out_col: str = "cos",
) -> DataFrame:
    """Vectorized cosine for an explicit candidate-pair relation:
    (id_a, id_b, vec_a, vec_b) -> (id_a, id_b, cos), one einsum (row-
    wise dot) + two norm reductions per Arrow batch instead of a
    ~3x64-step scalar codegen fold per row. This is the exact-verify
    stage of every LSH/IVF pipeline — per-candidate work a cluster
    pays at any scale, which is why it runs as numpy over Arrow
    batches rather than expression folds (measured 37x vs DuckDB as
    a fold; see BASELINE.md round 2).

    The id columns must be integral (emitted as longs); vectors may
    be float32 arrays — promoted exactly to float64, matching a SQL
    CAST(... AS DOUBLE[])."""
    ida, idb = id_cols
    va, vb = vec_cols

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.array(pdf[va].tolist(), dtype=np.float64)
            b = np.array(pdf[vb].tolist(), dtype=np.float64)
            cos = np.einsum("ij,ij->i", a, b) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            )
            yield pd.DataFrame(
                {
                    ida: pdf[ida].to_numpy(dtype=np.int64),
                    idb: pdf[idb].to_numpy(dtype=np.int64),
                    out_col: cos,
                }
            )

    return pairs.select(ida, idb, va, vb).mapInPandas(
        op, f"{ida} long, {idb} long, {out_col} double"
    )


def centroid_rank(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    max_rank: int,
) -> DataFrame:
    """(vec_id, cid, rn): each vector's centroids ranked by cosine —
    rn=1 is the IVF bucket assignment, rn<=nprobe the probe set. One
    GEMM against the broadcast centroid matrix per Arrow batch
    replaces a crossJoin + scalar-fold + window (the window's shuffle
    disappears: ranking happens inside the batch). Deterministic
    order: (round(cos, 6) desc, cid asc), the same total order the
    SQL form uses."""
    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    cmat = np.array([c[1] for c in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            sims = (mat @ cmat.T) / np.outer(np.linalg.norm(mat, axis=1), cnorm)
            r6 = np.round(sims, 6)
            out = []
            for i in range(len(ids)):
                order = np.lexsort((cids, -r6[i]))[:max_rank]
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids[i],
                            "cid": cids[order],
                            "rn": np.arange(1, len(order) + 1),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return vectors.select("vec_id", "embedding").mapInPandas(
        op, "vec_id long, cid long, rn int"
    )


def kmeans_ivf_assign(vectors: DataFrame, n_clusters: int = 16,
                      seed: int = 7) -> DataFrame:
    """Learned IVF partitioning: KMeans centroids over the embedding
    column (MLlib, trained on a sample), returning (vec_id, bucket).
    The bucket column is the shuffle/bucketing key for an IVF index
    table; searches probe only the query's nearest bucket(s) —
    queries/similarity.py::q_ann_ivf demonstrates the search side with
    deterministic centroids (oracle-checkable), this is the learned
    variant (not oracle-checkable: KMeans is iterative/seeded)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feat)
    return model.transform(feat).select(
        "vec_id", F.col("prediction").cast("int").alias("bucket")
    )
