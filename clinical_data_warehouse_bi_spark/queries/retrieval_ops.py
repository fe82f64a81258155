"""Registered retrieval queries (beyond-reference, round 8):
BM25 lexical search over the documents corpus — the keyword-side
counterpart to the registered dense-ANN family (q_cosine_topk,
q_ann_ivf_pq). See retrieval.py for the scale contract: the
single-query path never explodes or shuffles document data (per-term
tf as array expressions, one 1-row broadcast stats aggregate, final
TakeOrderedAndProject)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_data_warehouse_bi_spark import retrieval
from clinical_data_warehouse_bi_spark.io import load_tables
from clinical_data_warehouse_bi_spark.registry import register

#: fixed flagship query — terms chosen to hit the synthetic corpus's
#: vocabulary with distinct document frequencies
BM25_TERMS = ["hash", "join", "spark"]
BM25_K = 50

SQL_BM25_TOPK = retrieval.bm25_topk_oracle_sql(BM25_TERMS, BM25_K)


@register("q_bm25_topk", oracle=SQL_BM25_TOPK)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed 3-term query over documents.

    Shuffle-free scoring: tf per query term is a per-row
    size(filter(tokens, ...)) expression, corpus statistics (N,
    sum dl, per-term df) reduce to ONE broadcast row, and the top-k
    is a TakeOrderedAndProject — document text never enters an
    exchange. Scores rounded to 4 decimals in both engines (ln is
    not IEEE-correctly-rounded); ties broken by doc_id."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return retrieval.bm25_topk(docs, BM25_TERMS, BM25_K)
