"""Mergeable heavy-hitter synopsis (streaming.py): per-batch
truncated summaries with per-batch error budgets, derived
lower/upper frequency bounds, exactly-once replay, and
bound-preserving compaction. Ground truth is an exact Python
recount of the same rows."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import streaming

K = 8


def _zipf_batches(n_batches=4, rows_per=400, seed=11):
    """Skewed key stream: a few heavy keys + a long tail, with the
    tail keys shifted per batch so batches disagree on their top."""
    rng = random.Random(seed)
    batches = []
    for b in range(n_batches):
        rows = []
        for _ in range(rows_per):
            if rng.random() < 0.55:
                rows.append(f"hh{rng.randint(0, 3)}")        # 4 heavy keys
            else:
                rows.append(f"t{b}_{rng.randint(0, 60)}")    # batch-local tail
        batches.append(rows)
    return batches


@pytest.fixture()
def built(spark, tmp_path):
    batches = _zipf_batches()
    path = str(tmp_path / "hh")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame([(x,) for x in rows], "k string")
        streaming.heavy_hitters_apply_batch(df, path, i, "k", k=K)
    truth = Counter(x for rows in batches for x in rows)
    return path, batches, truth


def _bounds(spark, path):
    return {
        r["key"]: (r["n_lower"], r["n_upper"], r["unseen_upper"])
        for r in streaming.read_heavy_hitters(spark, path).collect()
    }


def _assert_valid(bounds: dict, truth: Counter):
    unseen = next(iter(bounds.values()))[2] if bounds else 0
    for key, (lo, hi, _) in bounds.items():
        assert lo <= truth[key] <= hi, (key, lo, truth[key], hi)
    for key, n in truth.items():
        if key not in bounds:
            assert n <= unseen, (key, n, unseen)


def test_bounds_contain_truth(spark, built):
    path, _, truth = built
    bounds = _bounds(spark, path)
    assert len(bounds) > 0
    _assert_valid(bounds, truth)
    # the genuinely heavy keys are all reported, with tight bounds:
    # stored every batch -> zero missed-batch slack -> exact counts
    for h in ("hh0", "hh1", "hh2", "hh3"):
        lo, hi, _ = bounds[h]
        assert lo == truth[h] == hi


def test_error_budget_respects_pigeonhole(spark, built):
    path, batches, _ = built
    unseen = next(iter(_bounds(spark, path).values()))[2]
    budget_limit = sum(len(rows) // (K + 1) for rows in batches)
    assert 0 < unseen <= budget_limit


def test_per_batch_state_is_bounded(spark, built):
    path, _, _ = built
    syn = spark.read.parquet(path)
    per_batch = {
        r["batch_id"]: r["n"]
        for r in syn.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= K for n in per_batch.values())


@pytest.mark.slow
def test_replay_is_idempotent(spark, built):
    path, batches, truth = built
    before = _bounds(spark, path)
    df = spark.createDataFrame([(x,) for x in batches[1]], "k string")
    streaming.heavy_hitters_apply_batch(df, path, 1, "k", k=K)  # replay
    assert _bounds(spark, path) == before


@pytest.mark.slow
def test_compaction_preserves_bound_validity(spark, built):
    path, batches, truth = built
    before = _bounds(spark, path)
    info = streaming.compact_heavy_hitters(spark, path, keep=6)
    assert info["partitions_after"] == 1
    after = _bounds(spark, path)
    assert len(after) <= 6
    _assert_valid(after, truth)
    # bounds may only loosen, never tighten past validity
    for key, (lo, hi, _) in after.items():
        blo, bhi, _ = before[key]
        assert lo <= blo or lo <= truth[key]
        assert hi >= truth[key]
    # heavy keys survive compaction and stay reported
    assert {"hh0", "hh1", "hh2", "hh3"} <= set(after)
    # appends after compaction keep the contract
    extra = [f"hh0"] * 50 + [f"new{j}" for j in range(30)]
    df = spark.createDataFrame([(x,) for x in extra], "k string")
    streaming.heavy_hitters_apply_batch(df, path, 10, "k", k=K)
    truth2 = truth + Counter(extra)
    _assert_valid(_bounds(spark, path), truth2)


@pytest.mark.slow
def test_streaming_end_to_end(spark, tmp_path):
    batches = _zipf_batches(n_batches=2, rows_per=300, seed=5)
    src = str(tmp_path / "src")
    path = str(tmp_path / "hh")
    spark.createDataFrame(
        [(x,) for x in batches[0]], "k string"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    q = streaming.streaming_heavy_hitters(
        stream, path, "k", k=K, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(x,) for x in batches[1]], "k string"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    truth = Counter(x for rows in batches for x in rows)
    bounds = _bounds(spark, path)
    _assert_valid(bounds, truth)
    assert {"hh0", "hh1", "hh2", "hh3"} <= set(bounds)


def test_rejects_bad_k(spark, tmp_path):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        streaming.heavy_hitters_apply_batch(df, str(tmp_path / "x"), 0, "k", k=0)
    with pytest.raises(ValueError):
        streaming.compact_heavy_hitters(spark, str(tmp_path / "x"), keep=0)


# --------------------------------------- as-of (time-travel) reads


@pytest.mark.slow
def test_read_as_of_reconstructs_each_historical_state(spark, built):
    from clinical_data_warehouse_bi_spark import io

    path, batches, _ = built
    assert io.list_batches(spark, path) == [0, 1, 2, 3]
    for t in range(4):
        got = io.read_as_of(spark, path, t)
        truth_t = Counter(x for rows in batches[: t + 1] for x in rows)
        # re-derive bounds from only the visible partitions
        syn_keys = {r["key"] for r in got.collect()}
        assert syn_keys  # non-empty at every point
        # every visible contribution is <= that point's true count
        per_key = {
            r["key"]: r["n"]
            for r in got.groupBy("key").agg(F.sum("n").alias("n")).collect()
        }
        for key, n in per_key.items():
            assert n <= truth_t[key]


@pytest.mark.slow
def test_read_as_of_prunes_partitions(spark, built):
    from clinical_data_warehouse_bi_spark import io

    path, _, _ = built
    df = io.read_as_of(spark, path, 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the batch_id predicate must reach the scan's PARTITION filters
    # (listing-level pruning), not survive as a post-scan Filter
    assert "PartitionFilters" in plan and "batch_id" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    assert df.select("batch_id").distinct().count() == 2


@pytest.mark.slow
def test_read_as_of_refuses_compacted_history(spark, built):
    from clinical_data_warehouse_bi_spark import io

    path, _, _ = built
    streaming.compact_heavy_hitters(spark, path, keep=16)
    assert io.list_batches(spark, path) == [streaming.HH_BASE_BATCH]
    with pytest.raises(io.HistoryCompactedError):
        io.read_as_of(spark, path, 2)
