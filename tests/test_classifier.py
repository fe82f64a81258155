"""Distributed logistic-regression quality classifier: equivalence
with the driver-side numpy trainer, planted-signal recovery, JVM-side
scoring, and the corpus-filter composition."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import classifier
from clinical_data_warehouse_bi_spark.io import load_tables
from test_plans import physical_plan


def _planted(spark, n=400, d=4, seed=7):
    """Separable synthetic set: label = 1 iff w_true . x > 0."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    x[:, 0] = 1.0  # bias
    w_true = np.array([0.3, 2.0, -1.5, 0.7])[:d]
    y = (x @ w_true > 0).astype(np.float64)
    rows = [(i, x[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "features", "label"]).repartition(8)
    return df, x, y


def test_distributed_matches_numpy_reference(spark):
    df, x, y = _planted(spark)
    w_dist = classifier.train_logreg(df, n_iter=15, lr=0.5)
    w_ref = classifier.train_logreg_reference(x, y, n_iter=15, lr=0.5)
    # identical step rule; only per-batch float summation order differs
    assert np.allclose(w_dist, w_ref, atol=1e-8), (w_dist, w_ref)


def test_training_is_deterministic(spark):
    df, _, _ = _planted(spark)
    w1 = classifier.train_logreg(df, n_iter=10, lr=0.5)
    w2 = classifier.train_logreg(df, n_iter=10, lr=0.5)
    assert np.array_equal(w1, w2)


def test_recovers_planted_signal(spark):
    df, x, y = _planted(spark)
    w = classifier.train_logreg(df, n_iter=60, lr=1.0)
    scored = classifier.predict_proba(df, w)
    acc = (
        scored.select(
            ((F.col("proba") >= 0.5).cast("double") == F.col("label"))
            .cast("double")
            .alias("hit")
        )
        .agg(F.avg("hit"))
        .first()[0]
    )
    assert acc >= 0.95, acc


def test_l2_shrinks_weights(spark):
    df, _, _ = _planted(spark)
    w_free = classifier.train_logreg(df, n_iter=30, lr=1.0, l2=0.0)
    w_reg = classifier.train_logreg(df, n_iter=30, lr=1.0, l2=0.5)
    assert np.linalg.norm(w_reg) < np.linalg.norm(w_free)


def test_predict_proba_is_jvm_side(spark):
    df, x, y = _planted(spark)
    w = np.ones(4)
    plan = physical_plan(classifier.predict_proba(df, w))
    # unrolled arithmetic: no python UDF eval, no Arrow exchange
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # matches numpy sigmoid exactly (same IEEE ops)
    got = {
        r["doc_id"]: r["proba"]
        for r in classifier.predict_proba(df, w).collect()
    }
    want = 1.0 / (1.0 + np.exp(-(x @ w)))
    for i in range(len(x)):
        assert abs(got[i] - want[i]) < 1e-12


def test_quality_filter_end_to_end(spark, sf_dir):
    """Train on heuristic labels over the real documents table; the
    learned filter must agree with the labeling rule on ~all docs
    (features are the rule's own inputs, so this is separable)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    feats = classifier.featurize_documents(docs)
    # linear teacher: docs of >= 20 tokens (len_score threshold) —
    # learnable by a linear model; boundary docs have a thin margin
    # so agreement, not exact equality, is the contract
    labeled = feats.withColumn(
        "label", (F.col("features")[3] >= 0.2).cast("double")
    )
    w = classifier.train_logreg(labeled, n_iter=120, lr=2.0)
    scored = classifier.predict_proba(labeled, w)
    n = labeled.count()
    agree = scored.where(
        (F.col("proba") >= 0.5).cast("double") == F.col("label")
    ).count()
    assert agree / n >= 0.90, (agree, n)
    # the filter composition preserves the full document schema
    kept = classifier.quality_filter(docs, w, threshold=0.5)
    assert kept.columns == docs.columns
    assert 0 < kept.count() < n
