"""Multimodal plumbing tests: real Spark schema/partitioning/Arrow
batching around the stubbed codec."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import multimodal
from clinical_data_warehouse_bi_spark.io import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.attach_fake_media(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    meta = dict(media.dtypes)["media_meta"]
    assert "width" in meta and "duration_s" in meta


def test_feature_extraction_deterministic(spark, sf_dir, media):
    feats = multimodal.extract_features(media).cache()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = feats.join(docs, "doc_id")
    # n_bytes == utf-8 length of the text for every row
    bad = joined.filter(F.col("n_bytes") != F.length(F.encode("text", "utf-8"))).count()
    assert bad == 0
    # histogram buckets sum to n_bytes
    bad_hist = feats.filter(
        F.aggregate("histogram", F.lit(0).cast("bigint"), lambda a, x: a + x)
        != F.col("n_bytes")
    ).count()
    assert bad_hist == 0
    # spot-check one row against local numpy
    row = joined.orderBy("doc_id").first()
    arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
    assert row["n_bytes"] == arr.size
    assert row["mean_byte"] == pytest.approx(float(arr.mean()))


def test_feature_extraction_partition_invariant(media):
    """mapInPandas result must not depend on partitioning (batch
    shape independence)."""
    f1 = multimodal.extract_features(media.repartition(1)).select("doc_id", "mean_byte")
    f8 = multimodal.extract_features(media.repartition(8)).select("doc_id", "mean_byte")
    assert f1.exceptAll(f8).count() == 0 and f8.exceptAll(f1).count() == 0


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media, fps=2.0)
    assert plan.columns == ["doc_id", "frame_idx", "frame_offset_s"]
    assert plan.filter(F.col("frame_offset_s") < 0).count() == 0
    # every doc yields at least one frame
    assert plan.select("doc_id").distinct().count() == media.count()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "image/png", real_decode=True)


def test_resize_media_shapes_and_determinism(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.multimodal import attach_fake_media, resize_media

    docs = read_table(spark, sf_dir, "documents").limit(50)
    media = attach_fake_media(docs)
    resized = resize_media(media, width=8, height=4)
    rows = resized.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(bytes(r.content)) == 8 * 4
        assert r.media_meta.width == 8 and r.media_meta.height == 4
    # deterministic (fake decode is pure)
    again = {r.doc_id: bytes(r.content) for r in resize_media(media, 8, 4).collect()}
    assert {r.doc_id: bytes(r.content) for r in rows} == again


def test_arrow_batches_bounded_under_skew(spark):
    """The module docstring's scale claim, measured: with
    maxRecordsPerBatch set and size-bucket repartitioning, every
    Arrow batch delivered to Python is bounded in rows AND in bytes
    (no batch mixes the 100 KB blobs with the 10 B ones, so the row
    cap is a real memory cap)."""
    from typing import Iterator

    import pandas as pd

    from clinical_data_warehouse_bi_spark.multimodal import (
        repartition_by_size_bucket,
    )

    rows = [(i, b"x" * 10) for i in range(500)]
    rows += [(1000 + i, b"y" * 100_000) for i in range(8)]
    media = spark.createDataFrame(rows, "doc_id long, content binary")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sizes = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "n_rows": [len(pdf)],
                    "total_bytes": [int(sizes.sum())],
                    "min_blob": [int(sizes.min())],
                    "max_blob": [int(sizes.max())],
                }
            )

    cap = 4
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(cap))
    try:
        stats = repartition_by_size_bucket(media, partitions=8).mapInPandas(
            probe, "n_rows long, total_bytes long, min_blob long, max_blob long"
        ).collect()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert stats, "no batches observed"
    for r in stats:
        assert r["n_rows"] <= cap  # the row cap is honored per batch
        # size-bucketing keeps batches homogeneous: power-of-two
        # buckets mean max/min < 2 within any batch...
        assert r["max_blob"] < 2 * max(r["min_blob"], 1)
        # ...so the row cap IS a byte bound: rows x bucket ceiling
        assert r["total_bytes"] <= cap * r["max_blob"]
    # and the global worst batch is the big-blob bucket's cap, not
    # cap x largest blob mixed into every batch
    assert max(r["total_bytes"] for r in stats) <= cap * 100_000
