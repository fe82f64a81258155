"""Mergeable quantile synopsis (streaming.py): equi-width histogram
state with lossless merge, exactly-once replay, bin-width-bounded
estimates (vs numpy ground truth), and bit-identical compaction."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import streaming

LO, HI, BINS = 0.0, 100.0, 200
W = (HI - LO) / BINS


def _batches(seed=3, n_batches=3, rows=600):
    rng = random.Random(seed)
    out = []
    for _ in range(n_batches):
        # skewed mixture: most mass low, a heavy tail
        out.append([
            rng.uniform(0, 20) if rng.random() < 0.8 else rng.uniform(20, 95)
            for _ in range(rows)
        ])
    return out


@pytest.fixture()
def built(spark, tmp_path):
    batches = _batches()
    path = str(tmp_path / "qs")
    for i, vals in enumerate(batches):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        streaming.quantile_synopsis_apply_batch(df, path, i, "v", LO, HI, BINS)
    all_vals = np.array([v for vals in batches for v in vals])
    return path, batches, all_vals


QS = [0.1, 0.5, 0.9, 0.99]


def _est(spark, path):
    row = streaming.read_quantiles(spark, path, QS, LO, HI, BINS).collect()[0]
    return {q: row[f"q_{str(q).replace('.', '_')}"] for q in QS}


def test_estimates_within_bin_width(spark, built):
    path, _, all_vals = built
    est = _est(spark, path)
    for q in QS:
        truth = float(np.quantile(all_vals, q, method="linear"))
        assert abs(est[q] - truth) <= W + 1e-9, (q, est[q], truth)


def test_merge_is_lossless(spark, built, tmp_path):
    # multi-batch synopsis == single-batch synopsis over the union
    path, batches, _ = built
    single = str(tmp_path / "single")
    df = spark.createDataFrame(
        [(v,) for vals in batches for v in vals], "v double"
    )
    streaming.quantile_synopsis_apply_batch(df, single, 0, "v", LO, HI, BINS)
    assert _est(spark, path) == _est(spark, single)


def test_replay_is_idempotent(spark, built):
    path, batches, _ = built
    before = _est(spark, path)
    df = spark.createDataFrame([(v,) for v in batches[0]], "v double")
    streaming.quantile_synopsis_apply_batch(df, path, 0, "v", LO, HI, BINS)
    assert _est(spark, path) == before


def test_compaction_is_bit_identical(spark, built):
    path, _, all_vals = built
    before = _est(spark, path)
    info = streaming.compact_quantile_synopsis(spark, path)
    assert info["partitions_after"] == 1
    assert _est(spark, path) == before
    # appends after compaction still merge: bounds hold on the
    # combined distribution
    df = spark.createDataFrame([(50.0,)] * 100, "v double")
    streaming.quantile_synopsis_apply_batch(df, path, 9, "v", LO, HI, BINS)
    est = _est(spark, path)
    combined = np.concatenate([all_vals, np.full(100, 50.0)])
    for q in QS:
        truth = float(np.quantile(combined, q, method="linear"))
        assert abs(est[q] - truth) <= W + 1e-9, (q, est[q], truth)


def test_out_of_range_clamps_to_edge_bins(spark, tmp_path):
    path = str(tmp_path / "clamp")
    df = spark.createDataFrame(
        [(-50.0,), (-1.0,), (200.0,), (150.0,)], "v double"
    )
    streaming.quantile_synopsis_apply_batch(df, path, 0, "v", LO, HI, BINS)
    bins = {
        r["bin"]: r["n"]
        for r in spark.read.parquet(path).groupBy("bin").agg(
            F.sum("n").alias("n")
        ).collect()
    }
    assert bins == {0: 2, BINS - 1: 2}


def test_grouped_keys(spark, tmp_path):
    path = str(tmp_path / "keyed")
    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(i) / 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    streaming.quantile_synopsis_apply_batch(
        df, path, 0, "v", LO, HI, BINS, key_cols=["k"]
    )
    out = {
        r["k"]: r["q_0_5"]
        for r in streaming.read_quantiles(
            spark, path, [0.5], LO, HI, BINS, key_cols=["k"]
        ).collect()
    }
    assert abs(out["a"] - 49.5) <= W + 1e-9
    assert abs(out["b"] - 4.95) <= W + 1e-9


@pytest.mark.slow
def test_streaming_end_to_end(spark, tmp_path):
    batches = _batches(seed=9, n_batches=2, rows=400)
    src = str(tmp_path / "src")
    path = str(tmp_path / "qs")
    spark.createDataFrame(
        [(v,) for v in batches[0]], "v double"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("v double").parquet(src)
    q = streaming.streaming_quantiles(
        stream, path, "v", LO, HI, BINS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(v,) for v in batches[1]], "v double"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    all_vals = np.array([v for vals in batches for v in vals])
    est = _est(spark, path)
    for qq in QS:
        truth = float(np.quantile(all_vals, qq, method="linear"))
        assert abs(est[qq] - truth) <= W + 1e-9


def test_rejects_bad_inputs(spark, tmp_path):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        streaming.quantile_synopsis_apply_batch(
            df, str(tmp_path / "x"), 0, "v", 5.0, 5.0
        )
    with pytest.raises(ValueError):
        streaming.quantile_synopsis_apply_batch(
            df, str(tmp_path / "x"), 0, "v", 0.0, 1.0, n_bins=0
        )
    with pytest.raises(ValueError):
        streaming.read_quantiles(spark, str(tmp_path / "x"), [], 0.0, 1.0)
