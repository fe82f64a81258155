"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas
operators (the only part of the engine where Python touches row data
— decode/feature-extract is genuinely inexpressible in SQL).

The actual codec step is STUBBED (`real_decode=True` raises
NotImplementedError: no image/audio libraries in this container).
Everything around it — schema, partition-parallel batch iteration,
Arrow transfer, feature schema — is real and tested, so swapping in
PIL/ffmpeg later touches exactly one function.

Scale notes: binaries ride in parquet as BYTE_ARRAY; mapInPandas
processes Arrow record batches per partition (no per-row pickling).
Keep batches bounded with spark.sql.execution.arrow.maxRecordsPerBatch
when binaries are large; repartition by size-bucket first if blob
sizes are heavily skewed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: media metadata carried alongside every blob
MEDIA_META_FIELDS = (
    "media_type string, width int, height int, sample_rate int, duration_s double"
)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_byte double, byte_entropy double, "
    "histogram array<bigint>"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for a real media column: utf-8 bytes of
    the text as the blob + metadata derived from doc_id. Lets every
    downstream operator (and its partitioning behavior) run for real."""
    return docs.select(
        F.col(id_col),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col(id_col) % 640 + 32).cast("int").alias("width"),
            (F.col(id_col) % 480 + 32).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length("text") / 1000.0).alias("duration_s"),
        ).alias("media_meta"),
    )


def repartition_by_size_bucket(
    media: DataFrame, blob_col: str = "content", partitions: int | None = None
) -> DataFrame:
    """Co-locate similar-sized blobs (power-of-two size buckets as the
    partition key) so `spark.sql.execution.arrow.maxRecordsPerBatch`
    — a ROW cap — becomes a usable BYTE bound per Arrow batch: within
    a partition all blobs share a size bucket (max/min < 2x), so
    batch memory <= maxRecordsPerBatch x bucket ceiling, instead of
    `rows x largest-blob-anywhere` when a batch mixes 10 MB videos
    with 10-byte thumbnails. Measured (not just asserted) by
    tests/test_multimodal.py::test_arrow_batches_bounded_under_skew."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism
    bucket = F.floor(F.log2(F.greatest(F.length(blob_col), F.lit(1))))
    return media.repartition(n, bucket)


def decode_media(blob: bytes, media_type: str, real_decode: bool = False) -> np.ndarray:
    """THE stub: a real deployment decodes image/audio here. The fake
    path returns the raw bytes as a uint8 array — deterministic, so
    feature tests are exact."""
    if real_decode:
        raise NotImplementedError(
            "media codecs (PIL/libsndfile/ffmpeg) are not available in this "
            "environment; wire them here"
        )
    return np.frombuffer(blob, dtype=np.uint8)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column:
    byte count, mean, entropy, and a `bins`-bucket byte histogram.
    One mapInPandas pass; partition-parallel; no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["media_meta"]
            ):
                arr = decode_media(bytes(blob), meta["media_type"])
                hist = np.bincount(arr // (256 // bins), minlength=bins)[:bins]
                p = hist / max(arr.size, 1)
                nz = p[p > 0]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": int(arr.size),
                        "mean_byte": float(arr.mean()) if arr.size else 0.0,
                        "byte_entropy": float(-(nz * np.log2(nz)).sum()),
                        "histogram": hist.astype("int64").tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_bytes", "mean_byte", "byte_entropy", "histogram",
            ])

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video/audio frame-sampling plan: pure-SQL offset computation
    (JVM-side); the decode of each offset goes through decode_media.
    Returns one row per (doc_id, frame_offset_s)."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("media_meta.duration_s") * fps).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx"),
    ).select(
        "doc_id", "frame_idx", (F.col("frame_idx") / fps).alias("frame_offset_s")
    )


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize pass over the binary column: nearest-neighbor resample
    of the decoded array to width x height bytes, re-encoded as a new
    blob with updated metadata. Same Arrow-batched partition-parallel
    shape as extract_features — a real deployment swaps the resample
    line for PIL/The codec in decode_media and nothing else moves."""

    target = int(width) * int(height)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["media_meta"]
            ):
                arr = decode_media(bytes(blob), meta["media_type"])
                if arr.size == 0:
                    out = np.zeros(target, dtype=np.uint8)
                else:
                    idx = np.linspace(0, arr.size - 1, target).round().astype(np.int64)
                    out = arr[idx]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "content": out.tobytes(),
                        "media_meta": {
                            "media_type": meta["media_type"],
                            "width": int(width),
                            "height": int(height),
                            "sample_rate": int(meta["sample_rate"]),
                            "duration_s": float(meta["duration_s"]),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "content", "media_meta"])

    schema = (
        "doc_id bigint, content binary, media_meta struct<media_type: string, "
        "width: int, height: int, sample_rate: int, duration_s: double>"
    )
    return media.mapInPandas(op, schema=schema)
