"""Structured Streaming operator tests: drive the streams with the
driver's events table split into multiple parquet files (one
micro-batch each) and compare against batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import streaming
from clinical_data_warehouse_bi_spark.io import read_table


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into 3 files -> 3 micro-batches (ts in micros,
    value as string to match EVENT_SCHEMA)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", F.col("value").cast("string")
    )
    ev.repartition(3).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def batch_events(spark, stream_dir):
    return spark.read.parquet(stream_dir).cache()


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_matches_batch(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    # files are not chronologically ordered -> watermark must cover the
    # whole data span or legitimately-late rows get dropped (that IS
    # the operator's contract; here we test the aggregation itself)
    q = streaming.run_to_memory(
        streaming.windowed_counts(stream, watermark="60 days"),
        "win_counts",
        output_mode="complete",
    )
    _drain(q)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_sessionized_runs_and_bounds(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_to_memory(
        streaming.sessionized(stream, watermark="60 days"),
        "sessions",
        output_mode="complete",
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    assert total == batch_events.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_stream_static_enrich(spark, stream_dir, batch_events):
    dim = spark.createDataFrame(
        [("click", "web"), ("view", "web"), ("purchase", "commerce"),
         ("signup", "funnel"), ("error", "ops")],
        ["event_type", "category"],
    )
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_to_memory(
        streaming.enrich(stream, dim, "event_type"), "enriched", output_mode="append"
    )
    _drain(q)
    out = spark.sql("SELECT * FROM enriched")
    assert out.count() == batch_events.count()
    assert out.filter(F.col("category").isNull()).count() == 0


def test_running_user_state(spark, stream_dir, batch_events):
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_to_memory(
        streaming.running_user_state(stream), "user_state", output_mode="update"
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM user_state").collect()
    assert rows, "stateful operator emitted nothing"
    # per user: sum of per-batch increments == final total == batch count
    per_user_batches: dict[int, int] = {}
    finals: dict[int, int] = {}
    for r in rows:
        per_user_batches[r["user_id"]] = per_user_batches.get(r["user_id"], 0) + r["batch_events"]
        finals[r["user_id"]] = max(finals.get(r["user_id"], 0), r["total_events"])
    want = {
        r["user_id"]: r["n"]
        for r in batch_events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user_batches == want
    assert finals == want


def test_dedup_events_drops_redelivered_rows(spark, stream_dir, tmp_path, batch_events):
    """Simulate an at-least-once source: write the same events twice
    (two files), stream with dedup -> each event_id survives once."""
    dup_dir = str(tmp_path / "dup_events")
    ev = spark.read.parquet(stream_dir)
    ev.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    ev.coalesce(1).write.mode("append").parquet(dup_dir)

    stream = streaming.read_event_stream(spark, dup_dir)
    q = streaming.run_to_memory(
        streaming.dedup_events(stream, watermark="60 days"), "dedup_out"
    )
    _drain(q)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    want = batch_events.count()
    assert got.n == want  # every duplicate dropped
    assert got.d == want  # every original kept


def test_stratified_sample_filter_is_stream_compatible(spark, stream_dir, batch_events):
    """The deterministic hash-threshold sample is a stateless per-row
    filter, so the SAME expression runs unchanged on a stream and
    selects exactly the batch-selected subset (unified API; and unlike
    rand()-based sampling, re-processing a micro-batch after failure
    re-selects the same rows — effectively-once semantics for free)."""
    from clinical_data_warehouse_bi_spark.queries.core import _SQL_RATE_CASE

    u = F.expr(
        "cast(conv(substr(md5(cast(event_id as string)), 1, 7), 16, 10) as bigint)"
    )
    stream = streaming.read_event_stream(spark, stream_dir)
    q = streaming.run_to_memory(
        stream.filter(u < F.expr(_SQL_RATE_CASE)).select("event_id", "event_type"),
        "sampled",
    )
    _drain(q)
    got = {r["event_id"] for r in spark.sql("SELECT * FROM sampled").collect()}
    want = {
        r["event_id"]
        for r in batch_events.filter(u < F.expr(_SQL_RATE_CASE)).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, stream_dir, batch_events):
    """Watermarked stream-stream interval join (clicks x purchases of
    the same user within 1 hour) must produce exactly the batch join's
    pairs."""
    clicks = streaming.read_event_stream(spark, stream_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = (
        streaming.read_event_stream(spark, stream_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
            F.col("user_id").alias("r_user_id"),
        )
    )
    joined = streaming.stream_stream_interval_join(
        clicks, purchases, key="user_id", tolerance="1 hour", watermark="60 days"
    ).select("event_id", "r_event_id")
    q = streaming.run_to_memory(joined, "ssj")
    _drain(q)
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    b_clicks = batch_events.filter(F.col("event_type") == "click")
    b_pur = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        F.col("user_id").alias("r_user_id"),
    )
    want = {
        (r["event_id"], r["r_event_id"])
        for r in b_clicks.join(
            b_pur,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("ts"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 1 hour")),
        )
        .select("event_id", "r_event_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_salted_join_works_on_streams(spark, stream_dir):
    """salted_join's streaming fallback salt must not use
    monotonically_increasing_id (unsupported on streams) and must
    preserve join results."""
    from clinical_data_warehouse_bi_spark.joins import salted_join

    dim = spark.createDataFrame(
        [("click", "web"), ("purchase", "commerce")], ["etype", "category"]
    )
    stream = streaming.read_event_stream(spark, stream_dir)
    joined = salted_join(stream, dim, "event_type", "etype", buckets=4)
    q = streaming.run_to_memory(joined.select("event_id", "category"), "salted_out")
    _drain(q)
    got = spark.sql("SELECT count(*) AS n FROM salted_out").first()["n"]
    want = (
        spark.read.parquet(stream_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .count()
    )
    assert got == want


def test_stream_stream_join_right_key_validated(spark):
    """A right frame missing the r_<key> convention column fails fast
    with the convention spelled out (ADVICE r2), and right_key= names
    an arbitrary column instead."""
    import pytest

    from clinical_data_warehouse_bi_spark.streaming import (
        stream_stream_interval_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp"))
    bad_right = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "uid long, r_ts string"
    ).select("uid", F.col("r_ts").cast("timestamp"))
    with pytest.raises(ValueError, match="r_user_id"):
        stream_stream_interval_join(left, bad_right, "user_id")
    out = stream_stream_interval_join(
        left, bad_right, "user_id", right_key="uid"
    )
    assert out.count() == 1
