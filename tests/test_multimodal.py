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
