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


def _png_encode(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Independent test-side PNG writer (filter type selectable per
    row) so the decoder round-trip exercises every reconstruction
    branch against bytes produced by the RFC's forward transforms."""
    import struct
    import zlib

    if img.ndim == 2:
        h, w = img.shape
        ch, color = 1, 0
        flat = img
    else:
        h, w, ch = img.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        flat = img.reshape(h, w * ch)
    filters = filters if filters is not None else [0] * h
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y].astype(np.int32)
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        f = filters[y]
        raw.append(f)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            enc = np.empty(stride, np.int32)
            for i in range(stride):
                a = int(left[i])
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = int(cur[i]) - pred
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_png_decode_roundtrip_all_filters():
    """Every scanline filter type (None/Sub/Up/Average/Paeth) must
    reconstruct exactly, grayscale and RGB."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(10, 7), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    out = multimodal.decode_media(
        _png_encode(gray, filters), "image/png", real_decode=True
    )
    assert out.shape == (10, 7) and (out == gray).all()

    rgb = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    out3 = multimodal.decode_media(
        _png_encode(rgb, [4, 3, 2, 1, 0, 4]), "image/png", real_decode=True
    )
    assert out3.shape == (6, 5, 3) and (out3 == rgb).all()


def test_wav_decode_roundtrip():
    rng = np.random.RandomState(13)
    samples = rng.randint(-32768, 32768, size=500, dtype=np.int16)
    out = multimodal.decode_media(
        _wav_encode(samples), "audio/wav", real_decode=True
    )
    assert out.dtype == np.int16 and (out == samples).all()


def test_real_decode_unknown_format_raises():
    with pytest.raises(ValueError, match="no codec"):
        multimodal.decode_media(b"xx", "video/mp4", real_decode=True)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_media(b"xx", "image/png", real_decode=True)


def test_extract_features_real_decode_end_to_end(spark):
    """The full Arrow-batched operator over ACTUAL codec output: PNG
    pixel counts and WAV sample counts (not blob byte counts) must
    flow into the feature schema."""
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(9, 8), dtype=np.uint8)
    wav = rng.randint(-32768, 32768, size=300, dtype=np.int16)
    rows = [
        (1, bytearray(_png_encode(img, [0, 1, 2, 3, 4, 0, 1, 2, 3])),
         ("image/png", 8, 9, 0, 0.0)),
        (2, bytearray(_wav_encode(wav)), ("audio/wav", 0, 0, 16000, 300 / 16000.0)),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, content binary, media_meta struct<media_type: string,"
        " width: int, height: int, sample_rate: int, duration_s: double>",
    )
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_features(media, real_decode=True).collect()
    }
    assert feats[1]["n_bytes"] == img.size  # pixels, not blob bytes
    assert feats[1]["mean_byte"] == pytest.approx(float(img.mean()))
    assert feats[2]["n_bytes"] == wav.size  # samples, not blob bytes
    want_mean = float((((wav.astype(np.int32) + 32768) >> 8)).mean())
    assert feats[2]["mean_byte"] == pytest.approx(want_mean)
    assert sum(feats[1]["histogram"]) == img.size
    assert sum(feats[2]["histogram"]) == wav.size


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


def test_png_sub_filter_vectorized_wide_row():
    """The Sub filter's cumsum vectorization must reconstruct exactly
    on a wide all-Sub image (lane arithmetic wraps mod 256 like the
    per-pixel reference), for every channel count."""
    rng = np.random.RandomState(17)
    for shape in [(4, 257), (3, 129, 2), (3, 65, 3), (2, 33, 4)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = multimodal.decode_media(
            _png_encode(img, [1] * shape[0]), "image/png", real_decode=True
        )
        assert out.shape == img.shape and (out == img).all(), shape


def test_png_decode_size_fence():
    """Images past the pure-python decoder's byte fence must raise
    with a message pointing at the PIL branch, not silently enter the
    per-pixel loops (round-6 advice, closed round 8)."""
    import struct as _struct
    import zlib as _zlib

    import pytest

    h, w = 4200, 4200  # 16.8 MB reconstructed gray, just past the fence
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(t, d):
        c = _struct.pack(">I", len(d)) + t + d
        return c + _struct.pack(">I", _zlib.crc32(t + d) & 0xFFFFFFFF)

    raw = b"\x00" * (h * (w + 1))  # all-None filter rows of zeros
    blob = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw, 1))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PIL branch"):
        multimodal.decode_media(blob, "image/png", real_decode=True)


def test_audio_spectrogram_matches_numpy_reference(spark):
    """audio_spectrogram: sample-for-sample equality with a
    driver-side numpy reference on real 16-bit WAVs; a pure sine's
    energy peaks in the right FFT bin; short blobs yield zero
    frames."""
    sr, n_fft, hop = 16000, 256, 128
    t = np.arange(sr // 2) / sr  # 0.5 s
    sine = (10_000 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int16)
    noise = (np.random.default_rng(3).integers(-500, 500, sr // 4)).astype(
        np.int16
    )
    short = np.zeros(10, dtype=np.int16)
    meta = {
        "media_type": "audio", "width": 0, "height": 0,
        "sample_rate": sr, "duration_s": 0.5,
    }
    rows = [
        (1, bytearray(_wav_encode(sine, sr)), meta),
        (2, bytearray(_wav_encode(noise, sr)), meta),
        (3, bytearray(_wav_encode(short, sr)), meta),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, content binary, media_meta struct<media_type: string,"
        " width: int, height: int, sample_rate: int, duration_s: double>",
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.audio_spectrogram(media, n_fft=n_fft, hop=hop).collect()
    }

    win = np.hanning(n_fft)
    for doc_id, samples in ((1, sine), (2, noise)):
        pcm = samples.astype(np.float64)
        n_frames = 1 + (pcm.size - n_fft) // hop
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        want = np.abs(np.fft.rfft(pcm[idx] * win[None, :], axis=1))
        g = got[doc_id]
        assert (g["n_frames"], g["n_bins"]) == (n_frames, n_fft // 2 + 1)
        assert np.allclose(np.array(g["spectrogram"]), want.ravel(), atol=1e-9)
    # the sine's dominant bin is f * n_fft / sr = 16
    spec = np.array(got[1]["spectrogram"]).reshape(got[1]["n_frames"], -1)
    assert int(spec.sum(axis=0)[1:].argmax()) + 1 == round(1000.0 * n_fft / sr)
    assert got[3]["n_frames"] == 0 and got[3]["spectrogram"] == []

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.audio_spectrogram(media, n_fft=1)


def test_image_patches_exact_tiles(spark):
    """image_patches: every tile's pixels equal the numpy slice of
    the source image; partial edges are cropped; sub-patch images
    yield no rows."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)  # crops to 8x12
    tiny = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(_png_encode(img))),
        (2, bytearray(_png_encode(tiny))),
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {
        (r["doc_id"], r["patch_row"], r["patch_col"]): r
        for r in multimodal.image_patches(media, patch=4).collect()
    }
    assert {k[0] for k in got} == {1}
    assert len(got) == 2 * 3  # 8//4 x 12//4
    for (_, r, q), row in got.items():
        want = img[r * 4 : r * 4 + 4, q * 4 : q * 4 + 4, :]
        assert row["n_channels"] == 3
        assert np.array_equal(
            np.array(row["pixels"]).reshape(4, 4, 3), want.astype(np.float64)
        )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.image_patches(media, patch=0)


def test_audio_logmel_matches_numpy_reference(spark):
    """audio_logmel: filterbank rows sum triangularly and the framed
    log-mel equals the driver-side numpy composition exactly."""
    sr, n_fft, hop, n_mels = 16000, 256, 128, 23
    fb = multimodal.mel_filterbank(n_mels, n_fft, sr)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all() and fb.sum() > 0
    # every filter is unimodal with a peak of at most 1
    assert fb.max() <= 1.0 + 1e-12

    t = np.arange(sr // 2) / sr
    sine = (10_000 * np.sin(2 * np.pi * 800.0 * t)).astype(np.int16)
    media = spark.createDataFrame(
        [(7, bytearray(_wav_encode(sine, sr)))], "doc_id bigint, content binary"
    )
    got = multimodal.audio_logmel(
        media, n_fft=n_fft, hop=hop, n_mels=n_mels, sample_rate=sr
    ).first()
    pcm = sine.astype(np.float64)
    n_frames = 1 + (pcm.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    power = np.abs(np.fft.rfft(pcm[idx] * np.hanning(n_fft)[None, :], axis=1)) ** 2
    want = np.log(power @ fb.T + 1e-10)
    assert (got["n_frames"], got["n_mels"]) == (n_frames, n_mels)
    assert np.allclose(np.array(got["logmel"]), want.ravel(), atol=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.mel_filterbank(0, n_fft, sr)


# ---------------------------------------------------------------------------
# Perceptual image near-dup (round-16 verdict item 3)
# ---------------------------------------------------------------------------


def _hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_reference_properties():
    """phash_py: deterministic, shape-polymorphic (gray / RGB / RGBA /
    raw bytes), signed-long packed, and resolution-robust — the SAME
    picture at 2x resolution hashes close, which is the property that
    makes it a PERCEPTUAL hash rather than a byte hash."""
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (40, 52)).astype(np.uint8)
    assert multimodal.phash_py(gray) == multimodal.phash_py(gray.copy())
    # packs into a signed 64-bit long (bit 63 may be set)
    h = multimodal.phash_py(gray)
    assert -(1 << 63) <= h < (1 << 63)
    # rgb luma path runs and differs from the raw gray of one channel
    rgb = rng.randint(0, 256, (40, 52, 3)).astype(np.uint8)
    assert isinstance(multimodal.phash_py(rgb), int)
    rgba = np.dstack([rgb, np.full((40, 52), 255, np.uint8)])
    # alpha is ignored: RGBA == RGB bit-for-bit
    assert multimodal.phash_py(rgba) == multimodal.phash_py(rgb)
    # 2x nearest-neighbor upscale of the same picture stays within a
    # small radius (area-resize sees the same block structure)
    big = np.kron(gray, np.ones((2, 2), dtype=np.uint8))
    assert _hamming64(
        multimodal.phash_py(big), multimodal.phash_py(gray)
    ) <= 6
    # raw 1-D bytes fold deterministically
    flat = rng.randint(0, 256, 997).astype(np.uint8)
    assert multimodal.phash_py(flat) == multimodal.phash_py(flat.copy())


def test_phash_planted_near_dup_recall_png(spark):
    """Planted-recall contract on REAL decoded PNGs: 6 distinct
    random images, 3 of them with a near-copy carrying +-2 pixel
    noise — image_near_dup(real_decode=True) must find exactly the 3
    planted pairs (noise within radius, distinct images far apart)."""
    rng = np.random.RandomState(42)
    blobs, metas, ids = [], [], []
    base_imgs = []
    for i in range(6):
        # smooth structured images (random low-freq mixture), not iid
        # noise: pHash thresholds low-frequency DCT coefficients, so
        # the planted perturbation must not be of the same magnitude
        # as the image's own structure
        yy, xx = np.mgrid[0:48, 0:64]
        img = np.zeros((48, 64))
        for _ in range(5):
            fy, fx = rng.uniform(0.02, 0.2, 2)
            img += rng.uniform(20, 60) * np.sin(
                fy * yy + rng.uniform(0, 6)
            ) * np.cos(fx * xx + rng.uniform(0, 6))
        img = ((img - img.min()) / (img.ptp() + 1e-9) * 255).astype(np.uint8)
        base_imgs.append(img)
        blobs.append(_png_encode(img))
        ids.append(i)
    for i in range(3):  # near-copies of images 0..2 at ids 100..102
        noisy = base_imgs[i].astype(np.int32) + rng.randint(-2, 3, (48, 64))
        blobs.append(_png_encode(np.clip(noisy, 0, 255).astype(np.uint8)))
        ids.append(100 + i)
    rows = [
        (int(ids[j]), bytearray(blobs[j]),
         ("image/png", 64, 48, 16000, 0.0))
        for j in range(len(ids))
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id long, content binary, media_meta struct<"
        "media_type string, width int, height int, sample_rate int,"
        " duration_s double>",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in multimodal.image_near_dup(media, real_decode=True).collect()
    }
    assert got == {(0, 100), (1, 101), (2, 102)}, got


def test_phash_banding_matches_bruteforce(spark):
    """The banded candidate join is EXACT for radius < n_bands: its
    pair set equals the brute-force all-pairs Hamming filter on the
    same hashes (pigeonhole — 6 differing bits cannot spoil all 8
    bands)."""
    rng = np.random.RandomState(3)
    base = rng.randint(0, 2, 64)
    hashes = []
    for i in range(20):
        v = base.copy()
        flips = rng.choice(64, size=rng.randint(0, 12), replace=False)
        v[flips] ^= 1
        h = 0
        for b in v:
            h = (h << 1) | int(b)
        if h >= 1 << 63:
            h -= 1 << 64
        hashes.append((i, h))
    df = spark.createDataFrame(hashes, "doc_id long, phash long")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal.phash_near_dup_pairs(df, max_hamming=6).collect()
    }
    want = set()
    for i, (ida, ha) in enumerate(hashes):
        for idb, hb in hashes[i + 1:]:
            d = _hamming64(ha & (1 << 64) - 1, hb & (1 << 64) - 1)
            if d <= 6:
                want.add((min(ida, idb), max(ida, idb), d))
    assert got == want
    with pytest.raises(ValueError, match="exact only"):
        multimodal.phash_near_dup_pairs(df, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide 64"):
        multimodal.phash_near_dup_pairs(df, max_hamming=2, n_bands=5)


def test_q_image_near_dup_registered(spark, sf_dir):
    """The registered gate entry: the documents table's exact text
    duplicates give identical fake blobs -> hamming-0 pairs, so the
    rows-only gate row is non-empty; output is deterministic across
    partitionings."""
    from clinical_data_warehouse_bi_spark.queries.windows import (
        q_image_near_dup,
    )

    out = q_image_near_dup(spark, sf_dir)
    rows = {tuple(r) for r in out.collect()}
    assert rows and all(h == 0 for *_ab, h in rows)
    assert {tuple(r) for r in q_image_near_dup(spark, sf_dir).collect()} == rows


def test_incremental_phash_matches_full_rebuild(spark):
    """incremental_phash_pairs over a persisted (doc_id, phash) index
    == the full-rebuild banded pair set over corpus+batch, split by
    origin — the image tier's index-probe contract (the
    text.incremental_near_dup_pairs shape)."""
    rng = np.random.RandomState(5)
    base = rng.randint(0, 2, 64)

    def mk(flips):
        v = base.copy()
        v[flips] ^= 1
        h = 0
        for x in v:
            h = (h << 1) | int(x)
        return h - (1 << 64) if h >= 1 << 63 else h

    corpus = [(i, mk(rng.choice(64, rng.randint(0, 10), replace=False)))
              for i in range(12)]
    batch = [(100 + i, mk(rng.choice(64, rng.randint(0, 10), replace=False)))
             for i in range(6)]
    schema = "doc_id long, phash long"
    cdf = spark.createDataFrame(corpus, schema)
    bdf = spark.createDataFrame(batch, schema)
    inc = {
        (r.doc_a, r.doc_b, r.hamming, r.origin)
        for r in multimodal.incremental_phash_pairs(bdf, cdf).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in multimodal.phash_near_dup_pairs(
            cdf.unionByName(bdf)
        ).collect()
    }
    want = set()
    for a, b, h in full:
        if a < 100 and b < 100:
            continue  # corpus-internal: resolved at index build time
        origin = "batch" if a >= 100 and b >= 100 else "corpus-batch"
        want.add((a, b, h, origin))
    assert inc == want
    assert any(o == "corpus-batch" for *_x, o in inc)
    assert any(o == "batch" for *_x, o in inc)


@pytest.mark.slow
def test_streaming_phash_ingest_two_drains_and_replay(spark, tmp_path):
    """Two drains of fake-media batches: the pairs sink (distinct)
    equals the full-rebuild pair id-set; a verbatim replay of the
    second batch (its hashes already in the index) appends only
    duplicate rows — no self-pairs, no inventions."""
    from clinical_data_warehouse_bi_spark import streaming as S

    docs1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "completely different words entirely here now"),
         (3, "alpha beta gamma delta epsilon zeta")],  # dup of 1
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # dup of 1/3
         (11, "yet another unrelated body of text")],
        "doc_id long, text string",
    )
    m1 = multimodal.attach_fake_media(docs1)
    m2 = multimodal.attach_fake_media(docs2)
    index_path = str(tmp_path / "phash_index")
    pairs_path = str(tmp_path / "phash_pairs")
    S.phash_ingest_batch(m1, index_path, pairs_path)
    S.phash_ingest_batch(m2, index_path, pairs_path)
    got = {
        frozenset((r.doc_a, r.doc_b))
        for r in spark.read.parquet(pairs_path).collect()
    }
    want = {
        frozenset((r.doc_a, r.doc_b))
        for r in multimodal.image_near_dup(
            multimodal.attach_fake_media(
                docs1.unionByName(docs2)
            )
        ).collect()
    }
    assert got == want and {1, 3} in got and {1, 10} in got
    first_rows = spark.read.parquet(pairs_path).count()
    S.phash_ingest_batch(m2, index_path, pairs_path)  # replay
    rep = spark.read.parquet(pairs_path)
    assert all(r.doc_a != r.doc_b for r in rep.collect())
    assert {
        frozenset((r.doc_a, r.doc_b)) for r in rep.collect()
    } == want
    assert rep.count() > first_rows  # at-least-once duplicates landed
