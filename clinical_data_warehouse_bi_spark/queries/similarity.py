"""Similarity search over `embeddings` (north-star extensions):
brute-force cosine top-k as the exactness baseline, IVF-style
bucketed search as the scale path.

Numeric-parity design: dot products are computed as a sequential
left-fold in BOTH engines (Spark `aggregate()` over the array;
DuckDB `list_dot_product`) so the double summation order matches;
ranking uses round(cos, 6) with the neighbor id as tiebreak so a
hypothetical 1-ulp divergence cannot flip the compared output."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.io import load_tables
from clinical_data_warehouse_bi_spark.registry import register

#: number of query vectors / centroids / neighbors (tiny, fixed demo sizes)
N_QUERIES = 8
N_CENTROIDS = 4
TOP_K = 10

_SQL_VECS = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS n2
  FROM embeddings
"""


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, double[] embedding, squared norm. No pre-repartition:
    shuffling the raw arrays costs more than the fold parallelism
    buys (measured at sf0.1); on a real multi-split scan the fold is
    already partition-parallel."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        e.alias("e"),
        F.aggregate(
            F.zip_with(e, e, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        ).alias("n2"),
    )


def _dot_expr(a: str, b: str) -> Column:
    """Sequential-fold dot product (same summation order as DuckDB's
    list_dot_product), built as ONE parsed SQL string: a Column-object
    fold costs ~10 py4j round-trips per use in plan-build time; a
    string costs one."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


#: q_cosine_topk's DuckDB oracle, preserved after its round-9
#: registry retirement (slot went to q_top_ngrams, named a ready
#: candidate in SURVEY.md's round-9 log; witnesses: q_hybrid_topk's
#: dense leg keeps a registered brute-force cosine top-k under the
#: hash gate — the fold form whose numerics the GEMM path was proved
#: equal to for six straight rounds — q_embed_near_dup keeps the
#: registered embedding-cosine family, and q_ann_ivf_learned /
#: q_ann_ivf_pq the ANN tier. The Arrow/GEMM path itself keeps this
#: full cross-engine value check live in tests/test_retired_parity.py
#: and stays in the bench set / scale probes.)
SQL_COSINE_TOPK = f"""
    WITH n AS ({_SQL_VECS}),
    q AS (SELECT vec_id AS qid, e AS qe, n2 AS qn2 FROM n
          WHERE vec_id < {N_QUERIES}),
    p AS (SELECT q.qid, c.vec_id AS nid,
                 list_dot_product(q.qe, c.e) / (sqrt(q.qn2) * sqrt(c.n2)) AS cos
          FROM q, n c WHERE c.vec_id <> q.qid)
    SELECT qid, nid, rank, round(cos, 4) AS cosine
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, nid ASC) AS rank
          FROM p)
    WHERE rank <= {TOP_K}
    """


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: each of the first
    {N_QUERIES} vectors against the whole table, scored by the
    Arrow/GEMM path (similarity.cosine_topk_numpy): the tiny query
    matrix is closure-broadcast into every task, each scan partition
    does ONE numpy matrix multiply + partial top-k under the final
    total order, and only |partitions| x |queries| x k rows are ever
    exchanged — the vector table itself never shuffles. Replaces the
    round-2 scalar codegen fold (~64 lambda steps per pair, the 37.6x
    worst bench ratio) with per-batch BLAS; the DuckDB oracle is
    unchanged, so the hash gate proves GEMM == fold numerics after
    round(6)/round(4)."""
    from clinical_data_warehouse_bi_spark.similarity import cosine_topk_numpy

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    return cosine_topk_numpy(emb, queries, k=TOP_K)


_SQL_ANN_IVF = f"""
    WITH n AS ({_SQL_VECS}),
    cent AS (SELECT vec_id AS cid, e AS ce, n2 AS cn2 FROM n
             WHERE vec_id < {N_CENTROIDS}),
    assign AS (
      SELECT vec_id, cid AS bucket FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(v.e, c.ce)
                               / (sqrt(v.n2) * sqrt(c.cn2)), 6) DESC,
                          c.cid ASC) AS rn
        FROM n v, cent c)
      WHERE rn = 1),
    q AS (SELECT v.vec_id AS qid, v.e AS qe, v.n2 AS qn2, a.bucket
          FROM n v JOIN assign a ON a.vec_id = v.vec_id
          WHERE v.vec_id < {N_QUERIES}),
    p AS (SELECT q.qid, v.vec_id AS nid,
                 list_dot_product(q.qe, v.e) / (sqrt(q.qn2) * sqrt(v.n2)) AS cos
          FROM q
          JOIN assign a ON a.bucket = q.bucket
          JOIN n v ON v.vec_id = a.vec_id
          WHERE v.vec_id <> q.qid)
    SELECT qid, nid, rank, round(cos, 4) AS cosine
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, nid ASC) AS rank
          FROM p)
    WHERE rank <= 5
    """


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN (the scale path): assign every vector to
    its nearest of {N_CENTROIDS} deterministic centroids (here: the
    first vectors; k-means at scale), then search only the query's
    bucket. Turns O(N*Q) brute force into O(N/buckets * Q) with a
    shuffle keyed on bucket id. Same portable-cosine machinery as
    q_cosine_topk.

    Not registered: exactly the NPROBE=1 special case of
    q_ann_ivf_nprobe (registry cap consolidation). Kept as the
    narrow-API form; tests/test_similarity_engine.py checks it
    against the nprobe query, and _SQL_ANN_IVF stays its runnable
    DuckDB oracle."""
    n = _vectors(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("n2").alias("cn2")
    )
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(
            _dot_expr("e", "ce") / (F.sqrt(F.col("n2")) * F.sqrt(F.col("cn2"))),
            6,
        ).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    assign = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("bucket"))
    )
    q = (
        n.join(assign, "vec_id")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.col("n2").alias("qn2"),
            "bucket",
        )
    )
    cand = assign.select(F.col("vec_id").alias("cand_id"), F.col("bucket").alias("cb"))
    p = (
        q.join(cand, F.col("bucket") == F.col("cb"))
        .join(n, F.col("cand_id") == n["vec_id"])
        .filter(F.col("cand_id") != F.col("qid"))
        .select(
            "qid",
            F.col("cand_id").alias("nid"),
            (
                _dot_expr("qe", "e")
                / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("n2")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.round(F.col("cos"), 6).desc(), F.col("nid").asc())
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


#: probe the NPROBE nearest centroid buckets per query (the standard
#: IVF recall knob; q_ann_ivf is the nprobe=1 form)
NPROBE = 2


#: q_ann_ivf_nprobe's DuckDB oracle, preserved after its round-7
#: registry retirement (slot went to q_ann_ivf_pq) — the cross-engine
#: value check survives in tests/test_retired_parity.py.
SQL_ANN_IVF_NPROBE = f"""
    WITH n AS ({_SQL_VECS}),
    cent AS (SELECT vec_id AS cid, e AS ce, n2 AS cn2 FROM n
             WHERE vec_id < {N_CENTROIDS}),
    scored AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_dot_product(v.e, c.ce)
                             / (sqrt(v.n2) * sqrt(c.cn2)), 6) DESC,
                        c.cid ASC) AS rn
      FROM n v, cent c),
    assign AS (SELECT vec_id, cid AS bucket FROM scored WHERE rn = 1),
    probes AS (SELECT vec_id, cid AS bucket FROM scored
               WHERE rn <= {NPROBE} AND vec_id < {N_QUERIES}),
    q AS (SELECT v.vec_id AS qid, v.e AS qe, v.n2 AS qn2, pr.bucket
          FROM n v JOIN probes pr ON pr.vec_id = v.vec_id),
    p AS (SELECT q.qid, v.vec_id AS nid,
                 list_dot_product(q.qe, v.e) / (sqrt(q.qn2) * sqrt(v.n2)) AS cos
          FROM q
          JOIN assign a ON a.bucket = q.bucket
          JOIN n v ON v.vec_id = a.vec_id
          WHERE v.vec_id <> q.qid)
    SELECT qid, nid, rank, round(cos, 4) AS cosine
    FROM (SELECT qid, nid, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, nid ASC) AS rank
          FROM p)
    WHERE rank <= 5
    """


def q_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-bucket probing (nprobe={NPROBE}): each query
    searches its {NPROBE} nearest centroid buckets instead of one —
    the standard recall/cost knob (data vectors keep their single
    argmax bucket; only the probe side fans out, so candidate volume
    is nprobe x bucket size; a data vector lives in exactly one
    bucket, so probing distinct buckets never duplicates a candidate).

    Both vector-math stages run on the Arrow/GEMM path
    (similarity.centroid_rank / pairwise_cosine): centroid assignment
    is one matrix multiply per scan batch against the broadcast
    centroid matrix — replacing a crossJoin + 64-step scalar fold +
    row_number window (whose per-vector shuffle disappears: ranking
    happens inside the batch) — and candidate scoring is a row-wise
    einsum over the joined pairs. The SQL-fold construction remains
    as unregistered q_ann_ivf (nprobe=1), equivalence-tested against
    this query, and the unchanged DuckDB oracle hash-checks the GEMM
    numerics end-to-end.

    Round-7 registry retirement (cap is 50; slot went to
    q_ann_ivf_pq, which composes THIS query's probe machinery —
    centroid_rank at the same nprobe knob — with PQ shortlisting and
    exact re-rank): the driver now row-checks the composed flagship
    pipeline instead of this intermediate form. The full oracle
    comparison stays live in tests/test_retired_parity.py against
    SQL_ANN_IVF_NPROBE, and tests/test_similarity_engine.py keeps the
    nprobe/q_ann_ivf equivalence. Kept unregistered as the
    raw-vector IVF API."""
    from clinical_data_warehouse_bi_spark.similarity import (
        centroid_rank,
        pairwise_cosine,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_CENTROIDS).collect()
    ]
    # both the assignment and the probe set read the ranked relation:
    # persist the tiny (vec_id, cid, rn) output so the GEMM stage runs
    # once, not once per consumer (scalars cache nearly free)
    ranked = centroid_rank(emb, centroids, max_rank=NPROBE).persist()
    assign = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cand_id"), F.col("cid").alias("cb")
    )
    probes = ranked.filter(
        (F.col("rn") <= NPROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("p_vec"), F.col("cid").alias("bucket"))
    q = emb.join(probes, emb["vec_id"] == F.col("p_vec")).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "bucket"
    )
    pairs = (
        q.join(assign, F.col("bucket") == F.col("cb"))
        .join(emb, F.col("cand_id") == emb["vec_id"])
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
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cosine"))
    )


#: learned-IVF bucket count — kept equal to the deterministic demo's
#: N_CENTROIDS so the recall property test compares equal probe
#: budgets (nprobe/k fraction of the data); raising k narrows buckets
#: and trades recall for candidate volume, the standard IVF knob
LEARNED_K = N_CENTROIDS
#: KMeans seed — fixed so the index (and the rows-only check's row
#: count) is reproducible run-to-run
LEARNED_SEED = 7
#: fitted-quantizer memo per (application, sf_dir, k, seed) — see
#: q_ann_ivf_learned's docstring for why reuse is the honest cost.
#: Keyed on sparkContext.applicationId (stable per JVM context, never
#: recycled) rather than id(spark): CPython can reuse a freed id for
#: a new session, which would serve stale centroids. Entries are
#: plain float lists, so a dead application's entries waste only a
#: few KB until the (bounded: one per app x sf_dir x params) dict is
#: dropped with the process.
_QUANTIZER_CACHE: dict[tuple, list] = {}


def _quantizer_key(spark: SparkSession, sf_dir: str, *params) -> tuple:
    return (spark.sparkContext.applicationId, sf_dir, *params)


def q_ann_ivf_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a LEARNED index, end-to-end: KMeans centroids
    (similarity.kmeans_ivf_index) bucket every vector, each query
    probes its {NPROBE} nearest learned centroids by EUCLIDEAN
    distance — the same metric KMeans assigns with, so the probe set
    and the index agree — and only candidates from those buckets pay
    exact cosine scoring (similarity.pairwise_cosine), top-5 per
    query. Completes the learned path the round-3 review flagged as
    assignment-only: q_ann_ivf_nprobe keeps deterministic first-N
    centroids for oracle-ability; this is the same search shape
    against centroids the data actually chose.

    Round-10 registry retirement (cap is 50; the slot went to
    q_ann_ivf_pq_served): this was a rows-only entry, so retirement
    trades a row-count check for the richer registered tier —
    q_ann_ivf_pq keeps the learned quantizer + PQ pipeline
    row-checked and q_ann_ivf_pq_served adds the persisted-index
    serving contract; the learned-vs-arbitrary recall property and
    the probe-machinery cross-engine hash check (retired
    q_ann_ivf_nprobe) stay live in tests/test_similarity_engine.py
    and tests/test_retired_parity.py. Still benched via direct
    import (the bench.py convention).

    No oracle BY DESIGN: k-means is iterative/seeded, so no portable
    SQL reproduces its centroids; the driver records the rows-only
    check. The learned-vs-arbitrary recall property is proven on
    PLANTED-CLUSTER data (tests/test_similarity_engine.py): on the
    driver's uniform near-orthogonal vectors every centroid choice is
    statistically equivalent — there is no structure to learn — but
    on clustered data (the shape real embeddings have) the learned
    index must recall at least as much of the brute-force top-k as
    arbitrary first-N-vector centroids at the same probe budget.

    Scale shape: the quantizer trains on a BOUNDED deterministic
    sample driver-side (similarity.sampled_kmeans_centroids — the
    FAISS IVF recipe: hash-smallest ids via TakeOrdered, seeded
    restarted Lloyd's in numpy; the MLlib distributed fit remains
    available as kmeans_ivf_index, it just pays ~2 job barriers per
    iteration); full-table assignment and probe ranking are one
    broadcast-GEMM Arrow pass each (similarity.ivf_search — no
    crossJoin, no per-vector window shuffle); candidate volume is
    nprobe x bucket size with buckets sized by k."""
    from clinical_data_warehouse_bi_spark.similarity import (
        ivf_search,
        sampled_kmeans_centroids,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    # The quantizer is a pure function of (table, k, seed) — sample
    # selection is content-hashed and Lloyd's is seeded — so repeated
    # invocations in one session reuse the fitted centroids, the same
    # memoization rationale as io.read_table (a production index
    # trains once and serves many searches; refitting per query would
    # misrepresent the operator's cost at any scale).
    ck = _quantizer_key(spark, sf_dir, "ivf", LEARNED_K, LEARNED_SEED)
    centroids = _QUANTIZER_CACHE.get(ck)
    if centroids is None:
        centroids = sampled_kmeans_centroids(
            emb, n_clusters=LEARNED_K, seed=LEARNED_SEED
        )
        _QUANTIZER_CACHE[ck] = centroids
    return ivf_search(
        emb, centroids, n_queries=N_QUERIES, nprobe=NPROBE, topk=5,
        metric="euclidean",
    )


#: PQ geometry for the registered composed search: 64 driver dims /
#: m=8 subspaces = 8 dims per codeword; shortlist bounds the exact
#: re-rank per query
PQ_M = 8
PQ_SHORTLIST = 50


@register("q_ann_ivf_pq", oracle=None)
def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FAISS-style ANN pipeline, end-to-end
    (similarity.ivf_pq_search): learned IVF quantizer restricts each
    query to its {NPROBE} nearest buckets; PQ asymmetric distance
    (per-query LUT-sum over m={PQ_M} one-byte codes) scores those
    candidates WITHOUT touching float vectors; the top {PQ_SHORTLIST}
    per query pay exact cosine re-ranking. This is the flagship ANN
    entry the driver row-checks — the shape a 100 TB embedding store
    actually serves queries with, where the float vectors stay cold
    and only bucket ids, m-byte codes, and the shortlist are hot.

    No oracle BY DESIGN (the q_ann_ivf_learned convention): both the
    IVF centroids and the PQ codebooks come from seeded iterative
    Lloyd's, which no portable SQL reproduces. The value-level
    evidence lives in tests/test_similarity_engine.py: composed
    recall >= 0.8 of brute force on planted clusters, PQ
    reconstruction-beats-mean, shortlist-recall properties; the
    retired q_ann_ivf_nprobe twin keeps the probe machinery
    hash-checked cross-engine in tests/test_retired_parity.py.

    Quantizer + codebooks are memoized per (application, table) like
    q_ann_ivf_learned's — a production index trains once and serves
    many searches."""
    from clinical_data_warehouse_bi_spark.similarity import (
        ivf_pq_search,
        sampled_kmeans_centroids,
        train_pq_codebooks,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ck = _quantizer_key(spark, sf_dir, "ivf", LEARNED_K, LEARNED_SEED)
    centroids = _QUANTIZER_CACHE.get(ck)
    if centroids is None:
        centroids = sampled_kmeans_centroids(
            emb, n_clusters=LEARNED_K, seed=LEARNED_SEED
        )
        _QUANTIZER_CACHE[ck] = centroids
    bk = _quantizer_key(spark, sf_dir, "pq", PQ_M, LEARNED_SEED)
    codebooks = _QUANTIZER_CACHE.get(bk)
    if codebooks is None:
        codebooks = train_pq_codebooks(emb, m=PQ_M, seed=LEARNED_SEED)
        _QUANTIZER_CACHE[bk] = codebooks
    return ivf_pq_search(
        emb,
        centroids,
        codebooks,
        n_queries=N_QUERIES,
        nprobe=NPROBE,
        shortlist=PQ_SHORTLIST,
        topk=5,
    )


SQL_EMBED_QUANTIZE = """
    WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS m
          FROM n)
    SELECT vec_id,
           CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS scale,
           list_aggregate(
             list_transform(e, x -> CAST(CAST(floor(x * (CASE WHEN m > 0
                 THEN 127.0 / m ELSE 0.0 END) + 0.5) AS INT) AS VARCHAR)),
             'string_agg', '|') AS q
    FROM s
    """


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/transport
    op a training pipeline applies to embedding shards (4x smaller,
    dot products stay proportional). scale = 127 / max|x|; element ->
    floor(x * scale + 0.5) (explicit half-up: floor is IEEE-exact and
    engine-portable, unlike round()'s tie-breaking, which differs
    between engines). Pure per-row expression work — no shuffle, no
    Python; the quantized array is '|'-serialized in the compared
    output because the canonicalizers cannot hash lists.

    Round-8 registry retirement (cap is 50; the slot went to
    q_cohort_retention): hash-checked for five straight rounds on a
    frozen implementation. Witness: quantization's registered
    representative is the richer PQ tier (q_ann_ivf_pq: per-subspace
    codebooks, packed m-byte codes, ADC scoring); int8 scalar
    quantization keeps its full oracle comparison live in
    tests/test_retired_parity.py against SQL_EMBED_QUANTIZE."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    e = F.expr("transform(embedding, x -> cast(x as double))")
    s = emb.select("vec_id", e.alias("e")).withColumn(
        "m", F.expr("array_max(transform(e, x -> abs(x)))")
    )
    scale = F.expr("CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END")
    q = F.expr(
        "array_join(transform(e, x -> cast(cast(floor(x * (CASE WHEN m > 0"
        " THEN 127.0 / m ELSE 0.0 END) + 0.5) as int) as string)), '|')"
    )
    return s.select("vec_id", scale.alias("scale"), q.alias("q"))


#: demo near-dup threshold for the synthetic random embeddings (real
#: pipelines use ~0.95; the driver's vectors are near-orthogonal so a
#: production threshold would select nothing to compare)
NEAR_DUP_COS = 0.3

#: sign-LSH banding: 4 bands x 16 sign bits = 64 seeded random
#: hyperplanes. Multiple narrower bands (vs one wide bucket) keep
#: per-bucket populations bounded AND raise recall — the same
#: band/recall trade as MinHash.
LSH_BANDS, LSH_BAND_BITS = 4, 16
#: embedding dimensionality of the driver's `embeddings` table
EMB_DIMS = 64
#: seed of the Rademacher projection — both engines regenerate the
#: identical matrix from this integer (md5-derived, RNG-free)
LSH_SEED = 1803


def _lsh_matrix() -> list[list[int]]:
    from clinical_data_warehouse_bi_spark.similarity import rademacher_matrix

    return rademacher_matrix(LSH_SEED, LSH_BANDS * LSH_BAND_BITS, EMB_DIMS)


def _sql_band(j: int) -> str:
    """Band j's signature in DuckDB SQL: each bit is the sign of the
    SAME +-1-weighted element sum the GEMM path computes (signed
    literal multiplication is IEEE-exact, so only a dot product
    within ~1e-15 of zero could diverge between summation orders —
    impossible on continuous data)."""
    matrix = _lsh_matrix()
    bits = []
    for i in range(LSH_BAND_BITS):
        row = matrix[j * LSH_BAND_BITS + i]
        dot = " + ".join(f"({s})*e[{k + 1}]" for k, s in enumerate(row) if s)
        bits.append(
            f"(CASE WHEN {dot} >= 0"
            f" THEN {1 << (LSH_BAND_BITS - 1 - i)} ELSE 0 END)"
        )
    return " + ".join(bits)


_SQL_BAND_JOINS = "\n      UNION\n".join(
    f"      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b"
    f" FROM b a JOIN b c ON a.band{j} = c.band{j} AND a.vec_id < c.vec_id"
    for j in range(LSH_BANDS)
)


@register("q_embed_near_dup", oracle=f"""
    WITH n AS ({_SQL_VECS}),
    b AS (SELECT vec_id, e, n2,
                 {", ".join(f"{_sql_band(j)} AS band{j}" for j in range(LSH_BANDS))}
          FROM n),
    pairs AS (
{_SQL_BAND_JOINS}
    ),
    p AS (SELECT pr.vec_a, pr.vec_b,
                 list_dot_product(x.e, y.e) / (sqrt(x.n2) * sqrt(y.n2)) AS cos
          FROM pairs pr
          JOIN b x ON x.vec_id = pr.vec_a
          JOIN b y ON y.vec_id = pr.vec_b)
    SELECT vec_a, vec_b, round(cos, 4) AS cosine
    FROM p WHERE round(cos, 6) >= {NEAR_DUP_COS}
    """)
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection via multi-band
    sign-LSH over SEEDED RANDOM HYPERPLANES: 4 bands of 16 sign bits,
    each bit the sign of a Rademacher (+-1) projection regenerated
    from LSH_SEED — a candidate pair = equal signature in ANY band.
    Random hyperplanes mix every dimension, so recall survives the
    correlated/anisotropic dims of real embeddings where round 2's
    axis-aligned planes collapse (variance concentrates in a few
    principal components -> minor-dim sign bits are noise); the
    recall ordering is property-tested on a correlated synthetic set.

    Scale shape: band signatures come from ONE GEMM per Arrow batch
    (similarity.sign_lsh_bands); the band relation (vec_id, band,
    sig — three scalars, no arrays) is persisted once and self-joined
    for candidates (bounded buckets, never all-pairs); ONLY candidate
    pairs pay exact vector math, as a row-wise einsum
    (similarity.pairwise_cosine). Rounded before thresholding so a
    1-ulp divergence cannot flip membership. The DuckDB oracle
    regenerates the identical matrix as signed element sums, keeping
    the whole bucket structure hash-checked.

    Demo threshold note: 0.3 (production uses ~0.9) because the
    driver's synthetic vectors are near-orthogonal; the structural
    point (bounded buckets, candidates-only verification) is what
    carries to 100 TB."""
    from clinical_data_warehouse_bi_spark.similarity import sign_lsh_bands

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    e = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select("vec_id", e.alias("e"))

    bands = sign_lsh_bands(
        emb, _lsh_matrix(), LSH_BANDS, LSH_BAND_BITS
    ).persist()
    left = bands.select(F.col("vec_id").alias("vec_a"), "band", "sig")
    right = bands.select(
        F.col("vec_id").alias("vec_b"),
        F.col("band").alias("band_r"),
        F.col("sig").alias("sig_r"),
    )
    pairs = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("sig") == F.col("sig_r"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    from clinical_data_warehouse_bi_spark.similarity import pairwise_cosine

    va = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    vb = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    scored = pairwise_cosine(
        pairs.join(va, "vec_a").join(vb, "vec_b"),
        ("vec_a", "vec_b"),
        ("ea", "eb"),
    )
    return (
        scored.filter(F.round("cos", 6) >= F.lit(NEAR_DUP_COS))
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )

# ---------------------------------------------------------------------------
# IVF-PQ served from the persisted index — the vector twin of
# q_bm25_served (round-10 registration per the round-9 verdict)
# ---------------------------------------------------------------------------


def _ivf_pq_index_path(sf_dir: str) -> str:
    """Deterministic per-corpus cache location for the registered
    serving demo (the q_bm25_served convention):
    similarity.IVF_PQ_FORMAT_VERSION participates in the cache key,
    so a layout change can never serve a stale-format directory; the
    corpus dirs are read-only test fixtures, so content never goes
    stale."""
    import hashlib
    import os
    import tempfile

    from clinical_data_warehouse_bi_spark.similarity import (
        IVF_PQ_FORMAT_VERSION,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(),
        f"cdwbi_ivfpq_idx_{IVF_PQ_FORMAT_VERSION}_{key}",
    )


@register("q_ann_ivf_pq_served", oracle=None)
def q_ann_ivf_pq_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served FROM the persisted IVF-PQ index
    (similarity.build_ivf_pq_index + search_ivf_pq_index) — the
    operational half of q_ann_ivf_pq, registered per the round-9
    verdict so the on-disk VECTOR index contract sits under the
    driver's gate like q_bm25_served put the text one: bucket=
    partitioned postings with packed PQ codes, centroids + codebooks
    as JSON inside the directory committed after the postings, probe
    restriction executed as PARTITION PRUNING on the bucket=
    directories (plan-asserted in tests/test_similarity_engine.py),
    ADC LUT-sum scoring per Arrow batch, and exact re-rank only on
    the per-query shortlist. The index is built once per corpus into
    a cache dir and published with an atomic rename (a losing
    concurrent builder discards harmlessly); every later invocation
    is a pure pruned read — the 100 TB serving shape, where indexing
    cost is paid at ingest, not per query.

    No SQL oracle BY DESIGN (the q_ann_ivf_pq convention): the
    coarse quantizer and PQ codebooks come from seeded iterative
    Lloyd's, which no portable SQL reproduces. Value-level evidence
    in tests/test_similarity_engine.py: served == in-memory composed
    pipeline on the same seeded quantizers, recall >= 0.8 vs brute
    force on planted clusters, incremental-append searchability, and
    filtered-search pre-join semantics."""
    import os
    import shutil

    from clinical_data_warehouse_bi_spark.io import publish_index_dir
    from clinical_data_warehouse_bi_spark.similarity import (
        INDEX_META,
        build_ivf_pq_index,
        search_ivf_pq_index,
    )

    path = _ivf_pq_index_path(sf_dir)
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    if not os.path.exists(os.path.join(path, INDEX_META)):
        build_dir = f"{path}.build-{os.getpid()}"
        shutil.rmtree(build_dir, ignore_errors=True)
        build_ivf_pq_index(
            emb, build_dir, n_clusters=LEARNED_K, m=PQ_M, seed=LEARNED_SEED
        )
        # Lost race (complete index won) -> discard build; corrupt
        # meta-less leftover -> clear + retry, with the retry's own
        # OSError re-entering the check (bounded) so a builder that
        # publishes between our rmtree and rename never crashes us.
        publish_index_dir(build_dir, path, INDEX_META)
    return search_ivf_pq_index(
        spark,
        path,
        emb,
        n_queries=N_QUERIES,
        nprobe=NPROBE,
        shortlist=PQ_SHORTLIST,
        topk=5,
    )


def _hnsw_index_path(sf_dir: str) -> str:
    """Deterministic per-corpus cache location for the graph-ANN
    serving demo (the q_bm25_served convention):
    hnsw.HNSW_FORMAT_VERSION participates in the cache key, so a
    layout change can never serve a stale-format directory; the
    corpus dirs are read-only test fixtures, so content never goes
    stale."""
    import hashlib
    import os
    import tempfile

    from clinical_data_warehouse_bi_spark.hnsw import HNSW_FORMAT_VERSION

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"cdwbi_hnsw_idx_{HNSW_FORMAT_VERSION}_{key}"
    )


#: graph-ANN geometry for the registered serving demo: enough shards
#: to prove the fan-out/merge path, links and beam sized for >=0.9
#: recall on the driver corpus (recall property-tested on planted
#: clusters in tests/test_hnsw.py)
HNSW_SHARDS = 4
HNSW_M = 12
HNSW_BEAM = 32


@register("q_ann_hnsw", oracle=None)
def q_ann_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW-class graph ANN served FROM a persisted sharded
    small-world index (hnsw.build_hnsw_index + hnsw_index_search) —
    the high-recall serving-side alternative to IVF-PQ the round-12
    verdict named (item 8), registered so the graph index's on-disk
    contract sits under the driver's gate next to q_ann_ivf_pq_served
    and q_bm25_served: shard=-partitioned parquet adjacency + vectors,
    meta JSON committed last (complete-iff-present), atomic publish
    with lost-race discard, per-shard beam search fanned out as ONE
    vectorized task per shard, global (query_id) top-k merge as the
    only post-scan exchange.

    No SQL oracle BY DESIGN (the q_ann_ivf_pq convention): beam
    search over a k-NN graph is an iterative traversal no portable
    SQL reproduces. Value-level evidence in tests/test_hnsw.py:
    recall >= 0.9 vs exact brute force on planted clusters, recall
    at EQUAL distance-eval budget >= a random-scan baseline,
    served == inline equality, graph structural invariants, and the
    format-version guard."""
    import os
    import shutil

    from clinical_data_warehouse_bi_spark.hnsw import (
        HNSW_INDEX_META,
        build_hnsw_index,
        hnsw_index_search,
    )
    from clinical_data_warehouse_bi_spark.io import publish_index_dir

    path = _hnsw_index_path(sf_dir)
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    if not os.path.exists(os.path.join(path, HNSW_INDEX_META)):
        build_dir = f"{path}.build-{os.getpid()}"
        shutil.rmtree(build_dir, ignore_errors=True)
        build_hnsw_index(emb, build_dir, n_shards=HNSW_SHARDS, m=HNSW_M)
        publish_index_dir(build_dir, path, HNSW_INDEX_META)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    return hnsw_index_search(spark, path, queries, k=5, beam=HNSW_BEAM)


#: routed tier geometry: 8 cells so the 2-cell probe is a 25% scan
HNSW_ROUTED_CLUSTERS = 8
HNSW_PROBE_CLUSTERS = 2


def q_ann_hnsw_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN served through the ROUTED tier (round-13 verdict
    item 3; hnsw.build_routed_hnsw_index + hnsw_routed_search):
    shards are k-means cells with centroids in the index meta, each
    query probes its top-2 of 8 cells — a partition-pruned scan of
    25% of the shard= directories and per-shard beam search
    restricted to the routed queries, the sublinear serving path the
    full fan-out (q_ann_hnsw) lacks at large shard counts. Bench-only
    (not a gate slot): the routing contract is property-tested in
    tests/test_hnsw.py (recall >= 0.85 at the 25% probe fraction,
    strictly fewer distance evals than fan-out); this entry records
    the serving-latency number next to q_ann_hnsw's."""
    import os
    import shutil

    from clinical_data_warehouse_bi_spark.hnsw import (
        HNSW_INDEX_META,
        build_routed_hnsw_index,
        hnsw_routed_search,
    )
    from clinical_data_warehouse_bi_spark.io import publish_index_dir

    path = _hnsw_index_path(sf_dir) + "_routed"
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    if not os.path.exists(os.path.join(path, HNSW_INDEX_META)):
        build_dir = f"{path}.build-{os.getpid()}"
        shutil.rmtree(build_dir, ignore_errors=True)
        build_routed_hnsw_index(
            emb, build_dir, n_clusters=HNSW_ROUTED_CLUSTERS, m=HNSW_M
        )
        publish_index_dir(build_dir, path, HNSW_INDEX_META)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    return hnsw_routed_search(
        spark, path, queries, k=5, beam=HNSW_BEAM,
        probe_clusters=HNSW_PROBE_CLUSTERS,
    )
