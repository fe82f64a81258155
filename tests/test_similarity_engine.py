"""The numpy/MLlib similarity engine paths must agree with the
SQL-expressed oracle-checked baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import similarity
from clinical_data_warehouse_bi_spark.io import read_table
from clinical_data_warehouse_bi_spark.queries.similarity import (
    N_QUERIES,
    TOP_K,
    q_cosine_topk,
)


def test_numpy_topk_matches_sql_topk(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    got = {
        (r.qid, r.rank): (r.nid, r.cosine)
        for r in similarity.cosine_topk_numpy(emb, queries, k=TOP_K).collect()
    }
    want = {
        (r.qid, r.rank): (r.nid, r.cosine)
        for r in q_cosine_topk(spark, sf_dir).collect()
    }
    # same neighbor ids and 4-dp cosines at every rank
    assert got == want


def test_kmeans_ivf_assign_covers_all_vectors(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    assign = similarity.kmeans_ivf_assign(emb, n_clusters=4)
    assert assign.count() == emb.count()
    buckets = [r.bucket for r in assign.select("bucket").distinct().collect()]
    assert 1 < len(buckets) <= 4
    # deterministic under the fixed seed
    again = similarity.kmeans_ivf_assign(emb, n_clusters=4)
    assert assign.subtract(again).count() == 0
