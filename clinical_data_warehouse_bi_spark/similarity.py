"""Similarity-search engine pieces beyond the oracle-checked queries
(queries/similarity.py): the Arrow-batched numpy path for brute-force
top-k, and an MLlib-KMeans IVF index for learned partitioning.

Why a second implementation of cosine top-k: the SQL-expression form
(F.aggregate fold over arrays) is portable and oracle-checkable, but
folds element-by-element inside codegen. At real embedding scale
(billions of vectors x hundreds of dims) the winning shape is a
matrix multiply over Arrow-delivered batches — numpy BLAS does
batch_rows x dims @ dims x n_queries in one GEMM per batch. That is
exactly what mapInPandas gives us WITHOUT leaving Spark's execution
model: scan partitions stream in as pandas frames, each emits its
partial top-k, and a final tiny reduce merges k rows per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "qid long, nid long, cos double"


def cosine_topk_numpy(vectors: DataFrame, queries: list[tuple[int, list[float]]],
                      k: int = 10) -> DataFrame:
    """Brute-force cosine top-k via numpy GEMM inside mapInPandas.

    ``vectors``: (vec_id, embedding array<float>). ``queries``: small
    driver-side list [(qid, vector)] — broadcast into every task via
    closure capture (Arrow-serialized once per executor).

    Plan shape: scan -> mapInPandas (partition-local GEMM + partial
    top-k, output k rows per query per partition) -> global top-k
    window over the tiny partial set. No shuffle of the vector table,
    ever; the only exchanged data is |partitions| x |queries| x k
    rows."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)  # Q x D
    qnorm = np.linalg.norm(qmat, axis=1)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)  # N x D
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qmat.T) / np.outer(norms, qnorm)  # N x Q
            out = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                mask = ids != qid  # exclude self-match
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                # partial top-k under the SAME total order the final
                # window uses — (round(cos, 6) desc, nid asc) — so the
                # global top-k of per-partition top-ks is exactly the
                # top-k of the union (a raw-cos partial order could
                # drop a row that wins a rounded tie by neighbor id)
                order = np.lexsort(
                    (ids[cand_idx], -np.round(col[cand_idx], 6))
                )
                top = cand_idx[order[:k]]
                out.append(pd.DataFrame({
                    "qid": qid, "nid": ids[top], "cos": col[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = vectors.select("vec_id", "embedding").mapInPandas(op, TOPK_SCHEMA)
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("nid").asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


def pairwise_cosine(
    pairs: DataFrame,
    id_cols: tuple[str, str],
    vec_cols: tuple[str, str],
    out_col: str = "cos",
) -> DataFrame:
    """Vectorized cosine for an explicit candidate-pair relation:
    (id_a, id_b, vec_a, vec_b) -> (id_a, id_b, cos), one einsum (row-
    wise dot) + two norm reductions per Arrow batch instead of a
    ~3x64-step scalar codegen fold per row. This is the exact-verify
    stage of every LSH/IVF pipeline — per-candidate work a cluster
    pays at any scale, which is why it runs as numpy over Arrow
    batches rather than expression folds (measured 37x vs DuckDB as
    a fold; see BASELINE.md round 2).

    The id columns must be integral (emitted as longs); vectors may
    be float32 arrays — promoted exactly to float64, matching a SQL
    CAST(... AS DOUBLE[])."""
    ida, idb = id_cols
    va, vb = vec_cols

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.array(pdf[va].tolist(), dtype=np.float64)
            b = np.array(pdf[vb].tolist(), dtype=np.float64)
            cos = np.einsum("ij,ij->i", a, b) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            )
            yield pd.DataFrame(
                {
                    ida: pdf[ida].to_numpy(dtype=np.int64),
                    idb: pdf[idb].to_numpy(dtype=np.int64),
                    out_col: cos,
                }
            )

    return pairs.select(ida, idb, va, vb).mapInPandas(
        op, f"{ida} long, {idb} long, {out_col} double"
    )


def rademacher_matrix(seed: int, planes: int, dims: int) -> list[list[int]]:
    """Seeded +-1 random-hyperplane matrix, reproducible from an
    integer seed via md5 (no RNG state: any engine/language can
    regenerate the identical matrix, which is how the DuckDB oracle
    applies the same projection). Rademacher entries are the standard
    sign-LSH choice (Charikar-style random hyperplanes); unlike
    axis-aligned planes they mix every dimension, so recall survives
    correlated/anisotropic real-world embedding dims (see
    tests/test_properties.py recall property)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[0], 16) >= 8
            else -1
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def axis_matrix(planes: int, dims: int) -> list[list[int]]:
    """Axis-aligned plane matrix (plane p tests sign(x[p % dims])) —
    the round-2 banding, kept as the recall-comparison baseline."""
    return [[1 if d == p % dims else 0 for d in range(dims)] for p in range(planes)]


def sign_lsh_bands(
    vectors: DataFrame,
    matrix: list[list[int]],
    n_bands: int,
    band_bits: int,
) -> DataFrame:
    """(vec_id, band, sig): multi-band sign-LSH signatures via one
    GEMM per Arrow batch — bits = (X @ R^T >= 0), band j's signature
    packs its ``band_bits`` bits big-endian. The projection is the
    broadcast literal ``matrix`` (planes x dims, +-1 entries), so the
    identical banding is expressible in SQL as signed element sums —
    the DuckDB oracle runs exactly that, keeping the bucket structure
    hash-checkable."""
    rmat = np.array(matrix, dtype=np.float64)  # planes x dims
    weights = [
        np.array([1 << (band_bits - 1 - i) for i in range(band_bits)], dtype=np.int64)
        for _ in range(n_bands)
    ]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            bits = (mat @ rmat.T) >= 0  # N x planes
            out = []
            for j in range(n_bands):
                sig = bits[:, j * band_bits : (j + 1) * band_bits].astype(
                    np.int64
                ) @ weights[j]
                out.append(
                    pd.DataFrame({"vec_id": ids, "band": j, "sig": sig})
                )
            yield pd.concat(out, ignore_index=True)

    return vectors.select("vec_id", "embedding").mapInPandas(
        op, "vec_id long, band int, sig long"
    )


def centroid_rank(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    max_rank: int,
    metric: str = "cosine",
) -> DataFrame:
    """(vec_id, cid, rn): each vector's centroids ranked by the given
    metric — rn=1 is the IVF bucket assignment, rn<=nprobe the probe
    set. One GEMM against the broadcast centroid matrix per Arrow
    batch replaces a crossJoin + scalar-fold + window (the window's
    shuffle disappears: ranking happens inside the batch).
    Deterministic order: (round(score, 6) best-first, cid asc), the
    same total order the SQL form uses.

    ``metric``: "cosine" (descending, the oracle-checked form) or
    "euclidean" (ascending distance — matching MLlib KMeans's own
    assignment rule, so probing learned centroids agrees with the
    index's bucketing)."""
    if metric not in ("cosine", "euclidean"):
        raise ValueError(f"unknown metric: {metric!r}")
    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    cmat = np.array([c[1] for c in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    csq = np.einsum("ij,ij->i", cmat, cmat)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            dots = mat @ cmat.T  # N x C — the one GEMM either way
            if metric == "cosine":
                # descending cosine -> negate for the ascending sort
                score = -np.round(
                    dots / np.outer(np.linalg.norm(mat, axis=1), cnorm), 6
                )
            else:
                # |x - c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 is constant
                # per row so the ranking needs only |c|^2 - 2 x.c
                score = np.round(csq[None, :] - 2.0 * dots, 6)
            out = []
            for i in range(len(ids)):
                order = np.lexsort((cids, score[i]))[:max_rank]
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids[i],
                            "cid": cids[order],
                            "rn": np.arange(1, len(order) + 1),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return vectors.select("vec_id", "embedding").mapInPandas(
        op, "vec_id long, cid long, rn int"
    )


def kmeans_ivf_index(
    vectors: DataFrame, n_clusters: int = 16, seed: int = 7
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Learned IVF index: KMeans over the embedding column (MLlib),
    returning BOTH the assignment relation (vec_id, bucket) and the
    learned centroids [(cid, vector)] — the piece that lets a search
    probe the same buckets the index was built with
    (queries/similarity.py::q_ann_ivf_learned). The bucket column is
    the shuffle/bucketing key for the index table; at scale the model
    is fit on a sample and `transform` is one broadcast-GEMM pass.
    Not oracle-checkable (KMeans is iterative/seeded); the learned
    search is recall-property-tested against brute force instead."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feat)
    assign = model.transform(feat).select(
        "vec_id", F.col("prediction").cast("int").alias("bucket")
    )
    centroids = [
        (cid, [float(x) for x in center])
        for cid, center in enumerate(model.clusterCenters())
    ]
    return assign, centroids


def kmeans_ivf_assign(vectors: DataFrame, n_clusters: int = 16,
                      seed: int = 7) -> DataFrame:
    """Assignment-only view of kmeans_ivf_index (kept as the narrow
    API used by the bucketed-index write path)."""
    return kmeans_ivf_index(vectors, n_clusters, seed)[0]


def sampled_kmeans_centroids(
    vectors: DataFrame,
    n_clusters: int,
    seed: int = 7,
    sample_cap: int = 4096,
    iters: int = 20,
    n_init: int = 8,
) -> list[tuple[int, list[float]]]:
    """Learned IVF centroids the way a production quantizer is
    actually trained: Lloyd's k-means on a BOUNDED sample, fit on the
    driver in numpy. The sample is the ``sample_cap`` hash-smallest
    vec_ids — a per-partition top-M + k-row merge (TakeOrdered), no
    full shuffle, deterministic and content-independent at any scale —
    so the driver holds O(sample_cap x dims) regardless of table
    size. k-means++ seeding + empty-cluster reseeding, fixed
    iteration count, all driven by a seeded RNG: the same data gives
    the same centroids run-to-run.

    Compared to distributing the fit (kmeans_ivf_index / MLlib): a
    quantizer needs only a representative sample (FAISS trains IVF
    cells exactly this way), and the distributed fit pays ~2 job
    barriers PER ITERATION — pure scheduling latency that dwarfs the
    math at any k where IVF makes sense. Assignment of the full table
    stays distributed either way (centroid_rank's broadcast-GEMM
    Arrow pass)."""
    sample = (
        vectors.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(sample_cap)
        .collect()
    )
    sample.sort(key=lambda r: r["vec_id"])  # RNG-independent order
    x = np.array([list(r["embedding"]) for r in sample], dtype=np.float64)
    best = _lloyd(x, n_clusters, seed, iters, n_init)
    return [(j, [float(v) for v in best[j]]) for j in range(n_clusters)]


def _lloyd(
    x: np.ndarray, n_clusters: int, seed: int, iters: int, n_init: int
) -> np.ndarray:
    """Seeded restarted Lloyd's k-means over a driver-side sample —
    the shared fit core of the learned-IVF quantizer and the PQ
    sub-quantizers. k-means++ init, fixed iteration count, distinct
    farthest-point reseeding of empty clusters, lowest-inertia
    restart wins; byte-deterministic for a given (x, seed)."""
    xsq = np.einsum("ij,ij->i", x, x)

    def dists(c: np.ndarray) -> np.ndarray:
        # |x-c|^2 via the GEMM identity — one matmul instead of an
        # O(N x k x D) broadcast temporary
        return np.maximum(
            xsq[:, None] - 2.0 * (x @ c.T) + np.einsum("ij,ij->i", c, c)[None, :],
            0.0,
        )

    best, best_inertia = None, None
    for trial in range(n_init):  # restarts: keep the lowest-inertia fit
        rng = np.random.RandomState(seed + trial)
        # k-means++ init
        centers = [x[rng.randint(len(x))]]
        for _ in range(1, n_clusters):
            d2 = dists(np.array(centers)).min(axis=1)
            probs = (
                d2 / d2.sum() if d2.sum() > 0 else np.full(len(x), 1.0 / len(x))
            )
            centers.append(x[rng.choice(len(x), p=probs)])
        c = np.array(centers)
        for _ in range(iters):
            d2 = dists(c)
            assign = d2.argmin(axis=1)
            far = None  # farthest-first order, computed on demand
            n_far = 0
            for j in range(n_clusters):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
                else:
                    # empty cluster: reseed to the NEXT-farthest point
                    # — successive empty clusters get DISTINCT seeds
                    # (one shared farthest point would leave duplicate
                    # centroids wasting IVF buckets); the modulo only
                    # cycles when n_clusters exceeds the sample size,
                    # where duplicates are unavoidable
                    if far is None:
                        far = np.argsort(-d2.min(axis=1), kind="stable")
                    c[j] = x[far[n_far % len(far)]]
                    n_far += 1
        inertia = float(dists(c).min(axis=1).sum())
        if best_inertia is None or inertia < best_inertia:
            best, best_inertia = c, inertia
    return best


def ivf_search(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_queries: int,
    nprobe: int,
    topk: int = 5,
    metric: str = "euclidean",
) -> DataFrame:
    """The IVF search pipeline over EXPLICIT centroids: assign every
    vector to its nearest centroid (rn=1), rank each query's nprobe
    nearest centroids, exact-cosine-score ONLY candidates from probed
    buckets, top-``topk`` per query under the engine's standard total
    order. Both ranking stages are broadcast-GEMM Arrow passes
    (centroid_rank); candidate scoring is a row-wise einsum
    (pairwise_cosine). ``metric`` picks the bucketing geometry and
    must match how the centroids were trained (euclidean for Lloyd's
    k-means, cosine for first-N-vector demos)."""
    assign = centroid_rank(vectors, centroids, max_rank=1, metric=metric)
    probes = centroid_rank(
        vectors.filter(F.col("vec_id") < n_queries),
        centroids,
        max_rank=nprobe,
        metric=metric,
    ).select(F.col("vec_id").alias("p_vec"), F.col("cid").alias("bucket"))
    cand = assign.select(
        F.col("vec_id").alias("cand_id"), F.col("cid").alias("cb")
    )
    q = vectors.join(probes, vectors["vec_id"] == F.col("p_vec")).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "bucket"
    )
    pairs = (
        q.join(cand, F.col("bucket") == F.col("cb"))
        .join(vectors, F.col("cand_id") == vectors["vec_id"])
        .filter(F.col("cand_id") != F.col("qid"))
        .select(
            "qid",
            F.col("cand_id").alias("nid"),
            "qe",
            F.col("embedding").alias("e"),
        )
    )
    p = pairwise_cosine(pairs, ("qid", "nid"), ("qe", "e"))
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("nid").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 256,
    seed: int = 7,
    sample_cap: int = 4096,
    iters: int = 20,
    n_init: int = 4,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al., "Product
    Quantization for Nearest Neighbor Search"): split the D dims into
    ``m`` contiguous subspaces and fit a ``ksub``-codeword quantizer
    per subspace — the compressed-vector scale path: a 64-dim float32
    vector (256 bytes) becomes m=8 one-byte codes, a 32x memory cut,
    which is what lets 100 TB of embeddings fit an IVF index's hot
    tier at all.

    Training follows the sampled-quantizer decision (SURVEY.md §9
    item 11): driver-side seeded Lloyd's (the shared ``_lloyd`` core)
    over the hash-smallest ``sample_cap`` vectors — TakeOrdered, no
    full shuffle — one independent fit per subspace (seed offset by
    subspace so codebooks differ). Returns
    codebooks[sub][code][subdim], plain floats for closure capture.

    D must divide by ``m`` (PQ's standard constraint)."""
    sample = (
        vectors.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(sample_cap)
        .collect()
    )
    sample.sort(key=lambda r: r["vec_id"])  # RNG-independent order
    x = np.array([list(r["embedding"]) for r in sample], dtype=np.float64)
    dims = x.shape[1]
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    dsub = dims // m
    k = min(ksub, len(x))  # degenerate tiny samples: fewer codewords
    books = []
    for sub in range(m):
        xs = x[:, sub * dsub : (sub + 1) * dsub]
        c = _lloyd(xs, k, seed + 1000 * sub, iters, n_init)
        books.append([[float(v) for v in row] for row in c])
    return books


def pq_encode(vectors: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes array<int>): each vector's per-subspace nearest
    codeword — one GEMM per (subspace, Arrow batch) against the
    broadcast codebook, fully distributed, no shuffle. The codes
    relation is the PQ index; pq_pack_codes gives it the m-byte
    binary physical form for the hot tier and generic sinks
    (measured nuance: parquet's element dictionary already stores
    ksub<=256 int codes at ~1.2 B/element, so at rest on parquet the
    two forms are comparable — the binary bound matters for memory /
    Arrow / broadcast and non-columnar storage)."""
    mats = [np.array(b, dtype=np.float64) for b in codebooks]
    csq = [np.einsum("ij,ij->i", c, c) for c in mats]
    m = len(mats)
    dsub = mats[0].shape[1]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for sub in range(m):
                xs = mat[:, sub * dsub : (sub + 1) * dsub]
                # argmin |x-c|^2 == argmin |c|^2 - 2 x.c (|x|^2 const/row)
                codes[:, sub] = np.argmin(
                    csq[sub][None, :] - 2.0 * (xs @ mats[sub].T), axis=1
                )
            yield pd.DataFrame({"vec_id": ids, "codes": list(codes)})

    return vectors.select("vec_id", "embedding").mapInPandas(
        op, "vec_id long, codes array<int>"
    )


def pq_pack_codes(codes: DataFrame, codes_col: str = "codes") -> DataFrame:
    """Pack an ``array<int>`` PQ-code column into an m-byte ``binary``
    — the physical type that makes the 'm bytes/vector' bound HARD:
    in-memory caches, Arrow transfer, broadcasts, and row-oriented
    sinks all hold exactly m payload bytes (an int array costs 4-8x
    there). On parquet at rest the element dictionary already stores
    ksub<=256 int codes at ~1.2 B/element, so both forms are the same
    order on disk — measured in tests/test_similarity_engine.py,
    which also asserts the packed column's on-disk width. Vectorized
    per Arrow batch; codes must fit a byte (PQ's ksub <= 256
    invariant — bytes() raises on violation rather than silently
    truncating). Write the result with any sink
    (io.write_training_shards composes)."""

    @F.pandas_udf("binary")
    def pack(s: pd.Series) -> pd.Series:
        return s.map(lambda a: bytes(bytearray(int(c) for c in a)))

    return codes.withColumn(codes_col, pack(codes_col))


def pq_unpack_codes(packed: DataFrame, codes_col: str = "codes") -> DataFrame:
    """Inverse of pq_pack_codes: ``binary`` back to ``array<int>`` for
    the ADC scorers (exact round-trip, property-tested)."""

    @F.pandas_udf("array<int>")
    def unpack(s: pd.Series) -> pd.Series:
        return s.map(lambda b: [int(x) for x in bytes(b)])

    return packed.withColumn(codes_col, unpack(codes_col))


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query build the
    m x ksub lookup table of squared distances from the query's
    subvectors to every codeword (tiny, driver-side), then score each
    database vector as the SUM of m table lookups — never
    reconstructing vectors, never touching floats per row. Output
    (qid, nid, rank, adist), ascending approximate squared euclidean,
    ties by nid (the engine's standard deterministic order).

    Plan shape mirrors cosine_topk_numpy: mapInPandas partial top-k
    per partition under the same rounded total order, then a global
    window over |partitions| x |queries| x k rows — the codes table
    never shuffles."""
    mats = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(mats)
    dsub = mats[0].shape[1]
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    luts = []  # per query: m x ksub squared-distance table
    for _, qv in queries:
        qarr = np.asarray(qv, dtype=np.float64)
        lut = np.stack(
            [
                np.sum(
                    (mats[sub] - qarr[sub * dsub : (sub + 1) * dsub][None, :])
                    ** 2,
                    axis=1,
                )
                for sub in range(m)
            ]
        )
        luts.append(lut)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cm = np.array(pdf["codes"].tolist(), dtype=np.int64)  # N x m
            out = []
            for j, qid in enumerate(qids):
                dist = luts[j][sub_idx[None, :], cm].sum(axis=1)  # N
                mask = ids != qid
                cand = np.nonzero(mask)[0]
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], np.round(dist[cand], 6)))
                top = cand[order[:k]]
                out.append(
                    pd.DataFrame(
                        {"qid": qid, "nid": ids[top], "adist": dist[top]}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = codes.select("vec_id", "codes").mapInPandas(
        op, "qid long, nid long, adist double"
    )
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("adist"), 6).asc(), F.col("nid").asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("adist", 4).alias("adist"))
    )


def ivf_pq_search(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    n_queries: int,
    nprobe: int,
    shortlist: int = 50,
    topk: int = 5,
) -> DataFrame:
    """The full FAISS-style ANN pipeline, composed from this module's
    pieces: IVF probe (broadcast-GEMM centroid ranking) restricts
    candidates to ``nprobe`` buckets; PQ asymmetric distance over the
    codes relation scores those candidates WITHOUT touching float
    vectors (per-query LUT-sum, vectorized per Arrow batch); the top
    ``shortlist`` per query then pays exact cosine on raw vectors —
    the re-rank that restores ranking fidelity ADC trades away
    (tests/test_similarity_engine.py pins that trade). At 100 TB the
    float vectors live cold/columnar and only bucket assignment, the
    m-byte codes, and the shortlist rows are ever hot.

    Queries are the table's first ``n_queries`` vectors (the engine's
    demo convention); their raw vectors are collected driver-side to
    build the LUTs — bounded, like every query-side structure here."""
    qrows = (
        vectors.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = sorted((r["vec_id"], list(r["embedding"])) for r in qrows)
    mats = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(mats)
    dsub = mats[0].shape[1]
    luts = {}
    for qid, qv in queries:
        qarr = np.asarray(qv, dtype=np.float64)
        luts[qid] = np.stack(
            [
                np.sum(
                    (mats[s] - qarr[s * dsub : (s + 1) * dsub][None, :]) ** 2,
                    axis=1,
                )
                for s in range(m)
            ]
        )

    assign = centroid_rank(vectors, centroids, max_rank=1, metric="euclidean")
    probes = centroid_rank(
        vectors.filter(F.col("vec_id") < n_queries),
        centroids,
        max_rank=nprobe,
        metric="euclidean",
    ).select(F.col("vec_id").alias("qid"), F.col("cid").alias("bucket"))
    codes = pq_encode(vectors, codebooks)
    cand = (
        probes.join(
            assign.select(F.col("vec_id").alias("nid"), F.col("cid").alias("cb")),
            F.col("bucket") == F.col("cb"),
        )
        .filter(F.col("nid") != F.col("qid"))
        .join(codes.select(F.col("vec_id").alias("nid"), "codes"), "nid")
        .select("qid", "nid", "codes")
    )

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            nids = pdf["nid"].to_numpy(dtype=np.int64)
            cm = np.array(pdf["codes"].tolist(), dtype=np.int64)
            dist = np.empty(len(qids), dtype=np.float64)
            for qid in np.unique(qids):
                rows = qids == qid
                dist[rows] = luts[qid][sub_idx[None, :], cm[rows]].sum(axis=1)
            yield pd.DataFrame({"qid": qids, "nid": nids, "adist": dist})

    scored = cand.mapInPandas(adc, "qid long, nid long, adist double")
    ws = Window.partitionBy("qid").orderBy(
        F.round(F.col("adist"), 6).asc(), F.col("nid").asc()
    )
    short = (
        scored.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= shortlist)
        .drop("__rn", "adist")
    )
    # exact re-rank of the tiny shortlist on raw vectors
    qvecs = vectors.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = short.join(qvecs, "qid").join(
        vectors.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("e")),
        "nid",
    )
    p = pairwise_cosine(pairs, ("qid", "nid"), ("qe", "e"))
    wf = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("nid").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= topk)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public description): semantic
    near-duplicate pruning over an embedding table — cluster the
    embeddings, compute pairwise cosine ONLY within each cluster, and
    drop every vector that has a higher-priority near-duplicate
    (cosine >= ``threshold`` to a lower id) in its cluster. The
    embedding-space complement of the text-hash dedup family: catches
    paraphrases and re-encodings no n-gram or MinHash machinery can.

    Returns (id, cluster, keep). Deterministic keep rule: a vector is
    dropped iff some lower-id cluster-mate sits above the threshold —
    the lowest id of every near-dup group survives (the published
    method keeps one arbitrary member; lowest-id is its deterministic
    instance).

    Scale shape: assignment is centroid_rank's broadcast-GEMM Arrow
    pass (euclidean — the metric the k-means index was built with);
    the quadratic pairwise stays WITHIN clusters, which is the knob
    the method itself prescribes (pick k so clusters stay small —
    cost is sum of cluster_size^2, never corpus^2); the verify is
    pairwise_cosine's einsum batch. One shuffle on cluster id for the
    self-join, one aggregation for the keep verdict."""
    assign = centroid_rank(
        vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        centroids,
        max_rank=1,
        metric="euclidean",
    ).filter(F.col("rn") == 1)
    tagged = (
        vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        )
        .join(assign.select("vec_id", "cid"), "vec_id")
    )
    a = tagged.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("cid").alias("ca"),
    )
    b = tagged.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("cid").alias("cb"),
    )
    cand = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b", "va", "vb")
    close = pairwise_cosine(cand, ("id_a", "id_b"), ("va", "vb")).filter(
        F.col("cos") >= threshold
    )
    # drop id_b of every close pair (it has a lower-id near-dup)
    dropped = close.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        assign.select("vec_id", F.col("cid").alias("cluster"))
        .join(dropped.withColumn("__drop", F.lit(True)), "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_index(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistable SemDeDup index relation (vec_id, cluster, keep,
    embedding) for a corpus: semantic_dedup's verdicts joined back
    with the raw vectors. Build ONCE under a frozen centroid set,
    persist (io.write_training_shards, or bucketed on ``cluster`` for
    an exchange-free probe join); incremental batches then probe the
    stored index (incremental_semantic_dedup) — corpus vectors are
    never re-read or re-assigned. The lsh_index convention
    (text.py:299) applied to the embedding-space dedup tier
    (round-16 verdict item 6).

    DROPPED members stay in the index on purpose: the batch drop
    rule is 'any lower-id cluster-mate above threshold', and a
    dropped corpus vector is still a lower-id mate of every future
    batch vector — pruning them would diverge from the full-rebuild
    verdicts (chain shape: corpus v dropped for kept u, batch x near
    v but not u)."""
    verdicts = semantic_dedup(
        vectors, centroids, threshold, id_col, vec_col
    )
    return verdicts.join(
        vectors.select(
            F.col(id_col), F.col(vec_col).alias("embedding")
        ),
        id_col,
    ).select(F.col(id_col).alias("vec_id"), "cluster", "keep", "embedding")


def incremental_semantic_dedup(
    batch: DataFrame,
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup verdicts for an INCOMING batch without re-scoring the
    corpus (round-16 verdict item 6 — the index-probe steady state
    every other dedup tier already has): assign the batch to the
    FROZEN centroids (one broadcast-GEMM Arrow pass, batch-
    proportional), then pairwise-verify each batch vector ONLY
    against (a) the stored members of its cluster and (b) its own
    lower-id batch cluster-mates. Returns (vec_id, cluster, keep)
    for the batch rows.

    EXACTLY the full rebuild's verdicts (pinned by
    tests/test_similarity_engine.py): corpus ids MUST all precede
    batch ids (any real ingest assigns monotone ids), so 'dropped
    iff some lower-id cluster-mate is above threshold' decomposes
    into the two candidate legs above — including near-dups of
    corpus members that were themselves dropped, which is why the
    index keeps them (see semdedup_index). Cost: cluster-bounded
    pairwise over touched clusters only, one shuffle on cluster id,
    never corpus^2 and never a corpus re-scan."""
    b = batch.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    assign = centroid_rank(b, centroids, max_rank=1, metric="euclidean").filter(
        F.col("rn") == 1
    )
    tagged = b.join(assign.select("vec_id", "cid"), "vec_id")
    bx = tagged.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("cid").alias("cb"),
    )
    # (a) stored members of the batch rows' clusters (kept AND
    # dropped — the full-rebuild contract)
    ix = index.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("cluster").alias("ca"),
    )
    corpus_cand = ix.join(bx, F.col("ca") == F.col("cb")).select(
        "id_a", "id_b", "va", "vb"
    )
    # (b) within-batch, lower id verifies against higher
    ax = tagged.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("cid").alias("ca"),
    )
    batch_cand = ax.join(
        bx, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b", "va", "vb")
    close = pairwise_cosine(
        corpus_cand.unionByName(batch_cand), ("id_a", "id_b"), ("va", "vb")
    ).filter(F.col("cos") >= threshold)
    dropped = close.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        assign.select("vec_id", F.col("cid").alias("cluster"))
        .join(dropped.withColumn("__drop", F.lit(True)), "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )


def covariance_stats(vectors: DataFrame, vec_col: str = "embedding") -> dict:
    """Exact mean vector and covariance matrix of an embedding
    column, distributed: every Arrow batch reduces to ONE partial row
    (count n, sum vector d, Gram matrix d*d flattened), the driver
    sums the per-batch partials and assembles cov = E[xx^T] - mm^T.
    Driver traffic is O(batches x d^2) — for d=64 that is 32 KB per
    batch regardless of how many billions of rows each batch covers;
    the vector table itself never shuffles and never leaves the
    executors.

    Returns {"n": int, "mean": (d,) float64, "cov": (d, d) float64}."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # N x D
            yield pd.DataFrame({
                "n": [mat.shape[0]],
                "s": [mat.sum(axis=0).tolist()],
                "g": [(mat.T @ mat).ravel().tolist()],
            })

    parts = vectors.select(vec_col).mapInPandas(
        op, "n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("covariance_stats: empty input")
    n = sum(r.n for r in parts)
    s = np.sum([np.asarray(r.s) for r in parts], axis=0)
    g = np.sum([np.asarray(r.g) for r in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    return {"n": n, "mean": mean, "cov": cov}


def pca_model(
    vectors: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """PCA (optionally whitening) over an embedding column — the
    dimensionality-reduction step a vector store runs before IVF/PQ
    (fewer dims = smaller codes, faster GEMM; whitening equalizes
    component variances, which PQ's per-subspace codebooks reward).
    One distributed pass (covariance_stats), then a d x d
    eigendecomposition on the driver — d is the embedding width, so
    the driver work is microseconds and independent of corpus size.

    Deterministic: numpy eigh is deterministic for a given matrix,
    and each component's sign is canonicalized (largest-|coord|
    entry made positive) so the model is reproducible run-to-run.

    Returns {"mean", "components" (k x d), "explained_var" (k,),
    "whiten": bool} — pass to pca_project."""
    st = covariance_stats(vectors, vec_col)
    vals, vecs = np.linalg.eigh(st["cov"])  # ascending
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T  # k x d
    ev = np.maximum(vals[order], 0.0)
    for i in range(comp.shape[0]):
        j = np.argmax(np.abs(comp[i]))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    if whiten:
        comp = comp / np.sqrt(ev + eps)[:, None]
    return {
        "mean": st["mean"],
        "components": comp,
        "explained_var": ev,
        "whiten": whiten,
    }


def pca_project(
    vectors: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """(id, out_col array<double>): project every vector onto the PCA
    (or whitening) basis. Pure Arrow-batched map — the (k x d) model
    rides the closure (serialized once per executor), no shuffle, and
    the output is ready for the ANN/PQ stack at width k."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comp = np.asarray(model["components"], dtype=np.float64)  # k x d

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            proj = (mat - mean) @ comp.T  # N x k
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                out_col: [r.tolist() for r in proj],
            })

    return vectors.select(id_col, vec_col).mapInPandas(
        op, f"{id_col} long, {out_col} array<double>"
    )


#: metadata filename inside a persisted IVF-PQ index directory
INDEX_META = "_index_meta.json"

#: on-disk layout version for persisted IVF-PQ indexes — bump on any
#: postings/metadata layout change so cached serving directories keyed
#: by it (queries.similarity.q_ann_ivf_pq_served) can never serve a
#: stale format (the retrieval.BM25_FORMAT_VERSION convention)
IVF_PQ_FORMAT_VERSION = 1


def build_ivf_pq_index(
    vectors: DataFrame,
    path: str,
    n_clusters: int = 16,
    m: int = 8,
    seed: int = 7,
) -> dict:
    """Persist a servable IVF-PQ index: train the coarse quantizer
    and PQ codebooks (bounded driver-side fits, the FAISS recipe),
    assign + encode every vector distributed (broadcast-GEMM, no
    shuffle), and write the postings as parquet PARTITIONED BY
    BUCKET with the m-byte packed codes. The partition layout IS the
    index's access path: a search touches nprobe/n_clusters of the
    files via partition pruning, never the whole postings set —
    the on-disk analogue of the in-memory probe restriction, and the
    missing operational half of q_ann_ivf_pq (a production index is
    built once and served from storage by later sessions, not
    refit per process).

    Metadata (centroids + codebooks, a few KB) lands as JSON inside
    the directory, written AFTER the postings commit so a complete
    meta file implies complete postings. Returns the metadata dict."""
    import json
    import os

    centroids = sampled_kmeans_centroids(vectors, n_clusters, seed=seed)
    codebooks = train_pq_codebooks(vectors, m=m, seed=seed)
    assign = centroid_rank(
        vectors, centroids, max_rank=1, metric="euclidean"
    ).select("vec_id", F.col("cid").alias("bucket"))
    codes = pq_pack_codes(pq_encode(vectors, codebooks))
    postings = codes.join(assign, "vec_id").select("vec_id", "codes", "bucket")
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    meta = {
        "centroids": [[int(c), [float(x) for x in v]] for c, v in centroids],
        "codebooks": codebooks,
        "m": m,
        "n_clusters": n_clusters,
    }
    with open(os.path.join(path, INDEX_META), "w") as f:
        json.dump(meta, f)
    return meta


def load_ivf_pq_index(path: str) -> dict:
    """Read a persisted index's metadata (the complete-iff-present
    commit marker build_ivf_pq_index documents)."""
    import json
    import os

    with open(os.path.join(path, INDEX_META)) as f:
        meta = json.load(f)
    meta["centroids"] = [(int(c), list(v)) for c, v in meta["centroids"]]
    return meta


def search_ivf_pq_index(
    spark,
    path: str,
    vectors: DataFrame,
    n_queries: int,
    nprobe: int,
    shortlist: int = 50,
    topk: int = 5,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Serve ANN queries FROM the persisted index: probe selection is
    driver-side numpy against the loaded centroids (queries are
    bounded); the postings scan filters to the probed buckets, which
    Catalyst turns into PARTITION PRUNING on the bucket= directories
    (plan-tested) — the scan reads ~nprobe/n_clusters of the index
    regardless of corpus size; ADC LUT-sums score the packed codes
    per Arrow batch; only the per-query shortlist pays exact cosine
    against the float vector table (semi-joined by id). No training,
    no full-index pass, no shuffle of anything corpus-sized.

    FILTERED search (the vector-store combine-with-metadata shape):
    pass ``allowed`` — a DataFrame whose ``vec_id`` column is the
    metadata-predicate-qualified id set — and candidates are
    semi-joined against it BEFORE ADC scoring, so the shortlist is
    built from qualifying vectors only (pre-filtering, not
    post-filter truncation: a selective predicate cannot starve the
    top-k, and no oversampling factor is needed). At 100 TB the
    semi-join keys on the already-pruned candidate relation, never
    the full postings set."""
    meta = load_ivf_pq_index(path)
    cents = meta["centroids"]
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    mats = [np.array(b, dtype=np.float64) for b in meta["codebooks"]]
    m = len(mats)
    dsub = mats[0].shape[1]

    qrows = (
        vectors.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = sorted((r["vec_id"], list(r["embedding"])) for r in qrows)
    luts, probe_rows = {}, []
    for qid, qv in queries:
        qarr = np.asarray(qv, dtype=np.float64)
        d2 = np.sum((cmat - qarr[None, :]) ** 2, axis=1)
        order = np.argsort(d2, kind="stable")[:nprobe]
        probe_rows += [(int(qid), int(cids[i])) for i in order]
        luts[qid] = np.stack(
            [
                np.sum(
                    (mats[s] - qarr[s * dsub : (s + 1) * dsub][None, :]) ** 2,
                    axis=1,
                )
                for s in range(m)
            ]
        )

    buckets = sorted({b for _, b in probe_rows})
    probes = spark.createDataFrame(probe_rows, "qid long, bucket int")
    postings = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    cand = (
        postings.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"), "codes")
    )
    if allowed is not None:
        cand = cand.join(
            allowed.select(F.col("vec_id").alias("nid")), "nid", "left_semi"
        )

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            nids = pdf["nid"].to_numpy(dtype=np.int64)
            cm = np.array(
                [list(bytes(b)) for b in pdf["codes"]], dtype=np.int64
            )
            dist = np.empty(len(qids), dtype=np.float64)
            for qid in np.unique(qids):
                rows = qids == qid
                dist[rows] = luts[qid][sub_idx[None, :], cm[rows]].sum(axis=1)
            yield pd.DataFrame({"qid": qids, "nid": nids, "adist": dist})

    scored = cand.mapInPandas(adc, "qid long, nid long, adist double")
    ws = Window.partitionBy("qid").orderBy(
        F.round(F.col("adist"), 6).asc(), F.col("nid").asc()
    )
    short = (
        scored.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= shortlist)
        .drop("__rn", "adist")
    )
    qvecs = vectors.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = short.join(qvecs, "qid").join(
        vectors.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("e")),
        "nid",
    )
    p = pairwise_cosine(pairs, ("qid", "nid"), ("qe", "e"))
    wf = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("nid").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= topk)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


def append_to_ivf_pq_index(spark, path: str, new_vectors: DataFrame) -> int:
    """Incremental ingest for the persisted IVF-PQ index: assign and
    encode ONLY the new batch against the index's frozen quantizers
    (the FAISS operational model — centroids/codebooks retrain on a
    cadence, not per batch), anti-join away vec_ids the postings
    already contain (column-pruned id scan, the dedup_ingest
    discipline — replaying a crashed append is a no-op), and append
    into the bucket partitions. Work is batch-proportional: the
    existing postings are only ever read as a one-column id relation.

    Returns the number of postings appended. Same single-writer
    scope as every file sink here; quantizer drift (a batch far from
    the trained distribution) is the signal to rebuild — monitor
    with centroid_rank distances."""
    meta = load_ivf_pq_index(path)
    assign = centroid_rank(
        new_vectors, meta["centroids"], max_rank=1, metric="euclidean"
    ).select("vec_id", F.col("cid").alias("bucket"))
    codes = pq_pack_codes(pq_encode(new_vectors, meta["codebooks"]))
    postings = codes.join(assign, "vec_id").select(
        "vec_id", "codes", "bucket"
    )
    existing = spark.read.parquet(path).select("vec_id")
    fresh = postings.join(existing, "vec_id", "left_anti").localCheckpoint()
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy("bucket").parquet(path)
    return n


def compact_ivf_pq_index(spark, path: str) -> dict:
    """Maintenance rewrite for an appended index: incremental ingest
    leaves >=1 file per batch per touched bucket; this rewrites the
    postings to ~one file per bucket (hash repartition on the
    partition column — each bucket's rows land in one task) with the
    shared crash-safe rename-swap (io.recover_compacted_dir sibling
    names), carrying the metadata JSON into the replacement BEFORE
    the swap so the commit-marker invariant (meta present => postings
    complete) holds at every crash point.

    Returns {"rows": n, "files_before": a, "files_after": b}."""
    import glob
    import os
    import shutil

    from clinical_data_warehouse_bi_spark.io import (
        maintenance_lock,
        recover_compacted_dir,
    )

    recover_compacted_dir(path)
    with maintenance_lock(path):
        meta = load_ivf_pq_index(path)
        files = lambda p: len(  # noqa: E731
            glob.glob(os.path.join(p, "bucket=*", "*.parquet"))
        )
        files_before = files(path)
        df = spark.read.parquet(path).localCheckpoint()
        rows = df.count()
        tmp = f"{path}.tmp-compact"
        old = f"{path}.old-compact"
        (
            df.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp)
        )
        import json

        with open(os.path.join(tmp, INDEX_META), "w") as f:
            json.dump(
                {
                    **meta,
                    "centroids": [
                        [int(c), [float(x) for x in v]]
                        for c, v in meta["centroids"]
                    ],
                },
                f,
            )
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": files(path),
    }


def pq_distortion(
    vectors: DataFrame, codebooks: list[list[list[float]]]
) -> dict:
    """Mean PQ quantization distortion over a vector set: encode with
    the FROZEN codebooks, reconstruct (concatenate the selected
    codewords), and average ||x - x_hat||^2 — the drift statistic
    that tells an operator WHEN the persisted index's quantizers
    need retraining (append_to_ivf_pq_index deliberately freezes
    them; distribution drift shows up here long before recall decays
    enough to notice in production). One Arrow-batched pass: each
    batch reduces to (n, sum squared error) — the covariance_stats
    idiom; vectors never shuffle.

    Returns {"n", "mse", "rmse"}. Compare against the value recorded
    at build time: a sustained rise is the rebuild signal."""
    mats = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(mats)
    dsub = mats[0].shape[1]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            err = 0.0
            for sub in range(m):
                xs = mat[:, sub * dsub : (sub + 1) * dsub]
                c = mats[sub]
                d2 = (
                    np.einsum("ij,ij->i", xs, xs)[:, None]
                    - 2.0 * xs @ c.T
                    + np.einsum("ij,ij->i", c, c)[None, :]
                )
                err += float(np.maximum(d2.min(axis=1), 0.0).sum())
            yield pd.DataFrame({"n": [len(mat)], "sse": [err]})

    parts = vectors.select("embedding").mapInPandas(op, "n long, sse double").collect()
    n = sum(r.n for r in parts)
    if n == 0:
        raise ValueError("pq_distortion: empty input")
    sse = sum(r.sse for r in parts)
    mse = sse / n
    return {"n": n, "mse": mse, "rmse": float(np.sqrt(mse))}


def frechet_distance(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
    eps: float = 1e-9,
) -> float:
    """Fréchet distance between two embedding distributions under
    the Gaussian approximation (Dowson & Landau 1982; the FID
    construction, Heusel 2017): |m_a - m_b|^2 + Tr(C_a + C_b -
    2 (C_a C_b)^{1/2}) — the drift scalar that tells an embedding
    pipeline its serving distribution has moved off the one the ANN
    index / classifier was fitted on (pq_distortion flags quantizer
    damage; this flags upstream distribution shift even when the
    quantizer still reconstructs well).

    Distributed shape: one covariance_stats pass per side (each
    Arrow batch reduces to a (n, sum, Gram) partial — vectors never
    shuffle, never reach the driver); the d x d matrix square root
    is a driver-side numpy eigendecomposition, O(d^3) on a matrix
    that fits in a cache line budget, not a Spark job — pure numpy
    via the symmetric sqrt(sqrt(Ca) Cb sqrt(Ca)) construction, no
    scipy dependency. ``eps`` regularizes against tiny negative
    eigenvalues from float roundoff (the standard FID guard)."""
    sa = covariance_stats(a, vec_col)
    sb = covariance_stats(b, vec_col)
    return _frechet_from_stats(sa, sb, eps)


def _frechet_from_stats(sa: dict, sb: dict, eps: float = 1e-9) -> float:
    import numpy as np

    mu_a, ca = np.asarray(sa["mean"]), np.asarray(sa["cov"])
    mu_b, cb = np.asarray(sb["mean"]), np.asarray(sb["cov"])
    d = len(mu_a)
    # the standard FID guard: regularize the covariances themselves
    # (a post-hoc sqrt(w + eps) correction biases the trace by
    # O(d * sqrt(eps)) — measured at 5e-4 on identical inputs)
    ca = ca + eps * np.eye(d)
    cb = cb + eps * np.eye(d)
    diff = float(((mu_a - mu_b) ** 2).sum())
    # (C_a C_b)^{1/2} via the symmetric construction
    # sqrt(sqrt(Ca) Cb sqrt(Ca)) — real for PSD inputs
    wa, va = np.linalg.eigh(ca)
    wa = np.clip(wa, 0.0, None)
    sqrt_ca = (va * np.sqrt(wa)) @ va.T
    inner = sqrt_ca @ cb @ sqrt_ca
    wi = np.clip(np.linalg.eigvalsh(inner), 0.0, None)
    tr_sqrt = float(np.sqrt(wi).sum())
    return diff + float(np.trace(ca) + np.trace(cb)) - 2.0 * tr_sqrt


def mine_hard_negatives(
    vectors: DataFrame,
    labels: DataFrame,
    anchors: list[tuple[int, list[float]]],
    k: int = 5,
    oversample: int = 4,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each anchor, the ``k`` nearest-by-cosine vectors whose label
    DIFFERS from the anchor's — the negatives that sit closest to
    the decision boundary, which is where contrastive pairs earn
    their gradient (random negatives are trivially separable; the
    standard in-batch-negatives upgrade, public practice from DPR /
    sentence-transformers training).

    ``anchors`` follows the cosine_topk_numpy queries convention: a
    bounded driver-side [(id, vector)] list. Search goes through the
    same GEMM path with ``k * oversample`` depth so that k survivors
    remain AFTER the different-label filter (an anchor whose
    neighborhood is label-pure beyond that depth returns fewer than
    k — by design, those negatives would not be hard).

    Returns (anchor_id, neg_id, cosine, rank) with rank 1..k per
    anchor.

    Scale shape: the vector table never shuffles (GEMM partials —
    the cosine_topk_numpy plan); the label joins run with the TINY
    candidate relation (<= anchors x k x oversample rows) broadcast
    against the corpus-sized labels — labels are never broadcast,
    never collected. The per-anchor re-rank windows over that same
    tiny relation."""
    if k <= 0 or oversample <= 0:
        raise ValueError("k and oversample must be positive")
    cands = cosine_topk_numpy(vectors, anchors, k * oversample).withColumnRenamed(
        "rank", "__srank"
    )
    # cands: (qid, nid, __srank, cosine) — the search rank carries the
    # GEMM path's full-precision total order through the label filter
    # (re-sorting by the 4dp display cosine would reorder near-ties)
    lab = labels.select(
        F.col(id_col).alias("__lid"), F.col(label_col).alias("__lab")
    )
    anchor_lab = lab.withColumnRenamed("__lab", "__anchor_lab")
    neigh_lab = lab.withColumnRenamed("__lab", "__neigh_lab")
    tagged = (
        F.broadcast(cands)
        .join(anchor_lab, cands["qid"] == anchor_lab["__lid"])
        .drop("__lid")
        .join(neigh_lab, cands["nid"] == neigh_lab["__lid"])
        .drop("__lid")
        .filter(F.col("__anchor_lab") != F.col("__neigh_lab"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("__srank"))
    return (
        tagged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("qid").alias("anchor_id"),
            F.col("nid").alias("neg_id"),
            "cosine",
            "rank",
        )
    )
