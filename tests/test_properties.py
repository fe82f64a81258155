"""Property-based tests (hypothesis) for the operator semantics that
are easiest to get subtly wrong: interval-join pick-first determinism,
orphan-cleanup null handling, salted-join equivalence, normalization
idempotence. Each property runs a handful of randomized examples
against a brute-force in-Python model (small data: the point is the
SEMANTICS under nulls/dupes/ties, not scale — plan shape is covered
by test_plans.py)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import joins

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
opt_keys = st.one_of(st.none(), keys)


@settings(**SETTINGS)
@given(
    fact=st.lists(opt_keys, min_size=0, max_size=12),
    dim=st.lists(keys, min_size=0, max_size=6),
)
@pytest.mark.slow
def test_orphan_cleanup_keeps_nulls_and_matches(spark, fact, dim):
    """DWH.sql:150-177 semantics: keep fact rows whose FK is NULL or
    present in dim; drop dangling non-null FKs."""
    fact_df = spark.createDataFrame(
        [Row(i=i, fk=v) for i, v in enumerate(fact)], "i int, fk int"
    )
    dim_df = spark.createDataFrame([Row(k=k) for k in set(dim)] or [], "k int")
    got = sorted(r.i for r in joins.orphan_cleanup(fact_df, dim_df, "fk", "k").collect())
    want = sorted(i for i, v in enumerate(fact) if v is None or v in set(dim))
    assert got == want


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=15),
    right=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=15),
)
@pytest.mark.slow
def test_salted_join_equals_plain_join(spark, left, right):
    """Salting is a pure physical rewrite: same multiset as the plain
    inner equi-join for any inputs, including duplicate keys."""
    l_df = spark.createDataFrame([Row(k=k, a=a) for k, a in left] or [], "k int, a int")
    r_df = spark.createDataFrame([Row(rk=k, b=b) for k, b in right] or [], "rk int, b int")
    got = sorted(
        (r.k, r.a, r.b)
        for r in joins.salted_join(l_df, r_df, "k", "rk", buckets=4).collect()
    )
    want = sorted(
        (lk, a, b) for lk, a in left for rk, b in right if lk == rk
    )
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(keys, st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=15
    )
)
@pytest.mark.slow
def test_interval_pick_first_is_deterministic_min(spark, rows):
    """J5/J6: for each left row, the surviving match is exactly the
    ORDER-minimal right row within the interval — never an arbitrary
    one (the MariaDB-UPDATE behavior we deliberately replace)."""
    left = spark.createDataFrame(
        [Row(lid=i, k=k, lo=lo, hi=lo + 5) for i, (k, lo, _) in enumerate(rows)] or [],
        "lid int, k int, lo int, hi int",
    )
    right = spark.createDataFrame(
        [Row(k2=k, ts=ts, rid=i) for i, (k, _, ts) in enumerate(rows)] or [],
        "k2 int, ts int, rid int",
    )
    out = joins.interval_join_pick_first(
        left,
        right,
        equi=left["k"] == right["k2"],
        ts_col=right["ts"],
        lo_col=left["lo"],
        hi_col=left["hi"],
        left_key=["lid"],
        order=[F.col("ts").asc_nulls_first(), F.col("rid").asc_nulls_first()],
    )
    got = {r.lid: (r.ts, r.rid) for r in out.collect() if r.rid is not None}
    want = {}
    for i, (k, lo, _) in enumerate(rows):
        matches = sorted(
            (ts, j)
            for j, (k2, _, ts) in enumerate(rows)
            if k2 == k and lo <= ts <= lo + 5
        )
        if matches:
            want[i] = matches[0]
    assert got == want
    # exactly one output row per left row (left join + pick-first)
    assert out.count() == len(rows)


@pytest.mark.slow
@settings(**SETTINGS)
@given(s=st.text(alphabet=" aAbB\t.", max_size=12))
def test_normalized_key_idempotent(spark, s):
    """J4: TRIM(LOWER(x)) must be a projection fixpoint."""
    from clinical_data_warehouse_bi_spark.cleanse import normalized_key

    df = spark.createDataFrame([Row(x=s)])
    once, twice = df.select(
        normalized_key(F.col("x")).alias("a"),
        normalized_key(normalized_key(F.col("x"))).alias("b"),
    ).first()
    assert once == twice


@settings(**SETTINGS)
@given(
    points=st.lists(st.integers(0, 50), min_size=0, max_size=12),
    intervals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 15)), min_size=0, max_size=8
    ),
    width=st.sampled_from([1, 3, 7, 16]),
)
def test_range_join_binned_equals_brute_force(spark, points, intervals, width):
    """Binned range join must equal the brute-force theta join for any
    bin width, with every true match appearing exactly once."""
    l_df = spark.createDataFrame(
        [Row(pid=i, p=p) for i, p in enumerate(points)] or [], "pid int, p int"
    )
    r_df = spark.createDataFrame(
        [Row(rid=i, lo=lo, hi=lo + ln) for i, (lo, ln) in enumerate(intervals)] or [],
        "rid int, lo int, hi int",
    )
    got = sorted(
        (r.pid, r.rid)
        for r in joins.range_join_binned(l_df, r_df, "p", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, ln) in enumerate(intervals)
        if lo <= p <= lo + ln
    )
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(st.integers(min_value=-100, max_value=100), min_size=0, max_size=40),
    nparts=st.integers(min_value=1, max_value=7),
)
@pytest.mark.slow
def test_zip_index_key_dense_unique(spark, rows, nparts):
    """zip_index_key must assign exactly the keys 1..N (dense, unique)
    for any input size and partitioning, and preserve the row
    multiset."""
    from clinical_data_warehouse_bi_spark.keys import zip_index_key

    df = spark.createDataFrame(
        [Row(v=v) for v in rows] or [], "v int"
    ).repartition(nparts)
    out = zip_index_key(df, "k").collect()
    assert sorted(r.k for r in out) == list(range(1, len(rows) + 1))
    assert sorted(r.v for r in out) == sorted(rows)


@settings(**SETTINGS)
@given(
    fps=st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=2, max_size=24
    ),
)
@pytest.mark.slow
def test_simhash_band_join_exact_for_k3(spark, fps):
    """4x8-bit banding over a 32-bit fingerprint is EXACT for Hamming
    radius <= 3 (pigeonhole): the banded candidate join must find
    precisely the brute-force pairs."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(doc_id=i, simhash=v) for i, v in enumerate(fps)],
        "doc_id int, simhash long",
    )
    bands = df.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                (F.shiftright("simhash", j * 8) % 256).cast("bigint")
                for j in range(4)
            ])
        ).alias("band", "sig"),
    )
    a = bands.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("ha"), "band", "sig"
    )
    b = bands.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("hb"),
        F.col("band").alias("bb"), F.col("sig").alias("sb"),
    )
    got = sorted(
        (r.da, r.db)
        for r in (
            a.join(b, (F.col("band") == F.col("bb")) & (F.col("sig") == F.col("sb"))
                   & (F.col("da") < F.col("db")))
            .select("da", "db", "ha", "hb")
            .distinct()
            .filter(F.expr("bit_count(ha ^ hb)") <= 3)
            .collect()
        )
    )
    want = sorted(
        (i, j)
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if bin(fps[i] ^ fps[j]).count("1") <= 3
    )
    assert got == want


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    """Observed per-stratum rates track the configured rates (binomial
    3-sigma), and the sample is bit-identical across runs (hash
    threshold, not rand())."""
    import math

    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.queries.core import (
        SAMPLE_RATES,
        q_stratified_sample,
    )

    totals = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["event_type"]: r["n"]
        for r in q_stratified_sample(spark, sf_dir)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for t, rate in SAMPLE_RATES.items():
        n = totals[t]
        expect = rate * n
        sigma = math.sqrt(n * rate * (1 - rate))
        assert abs(got.get(t, 0) - expect) <= 3 * sigma + 1, (t, got.get(t), expect)
    again = {
        r["event_type"]: r["n"]
        for r in q_stratified_sample(spark, sf_dir)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == again


def test_bucketed_exact_percentiles_match_builtin(spark, sf_dir):
    """The bounded-memory refinement algorithm must agree with
    Spark's percentile (and hence the DuckDB oracle) exactly."""
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.queries.core import (
        exact_percentiles_bucketed,
    )

    li = read_table(spark, sf_dir, "lineitem")
    specs = {
        "l_quantity": [(0.5, "median_qty"), (0.95, "p95_qty")],
        "l_extendedprice": [(0.5, "median_price")],
    }
    # native_distinct_max=0 forces the bucketed refinement for EVERY
    # column (the default hybrid would route low-cardinality
    # l_quantity through the native aggregate, leaving the refinement
    # untested on it)
    got = {
        r["l_returnflag"]: (r["median_qty"], r["p95_qty"], r["median_price"])
        for r in exact_percentiles_bucketed(
            li, "l_returnflag", specs, native_distinct_max=0
        )
    }
    want = {
        r["l_returnflag"]: (r["m"], r["p"], r["mp"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("m"),
            F.expr("percentile(l_quantity, 0.95)").alias("p"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("mp"),
        )
        .collect()
    }
    assert got == want  # bit-exact, not approx
    # the hybrid default (distinct-count auto-routing) must agree too
    hybrid = {
        r["l_returnflag"]: (r["median_qty"], r["p95_qty"], r["median_price"])
        for r in exact_percentiles_bucketed(li, "l_returnflag", specs)
    }
    assert hybrid == want


def test_bucketed_percentiles_ignore_nulls(spark):
    """NULL values must be excluded (percentile semantics), not binned
    into bucket 0."""
    from clinical_data_warehouse_bi_spark.queries.core import (
        exact_percentiles_bucketed,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("a", 3.0), ("b", None)],
        "k string, v double",
    )
    for ndm in (0, 65536):  # both the bucketed and native routes
        rows = {r["k"]: r for r in exact_percentiles_bucketed(
            df, "k", {"v": [(0.5, "med")]}, native_distinct_max=ndm
        )}
        assert rows["a"]["med"] == 2.0  # median of {1,2,3}, NULL ignored
        assert rows["b"]["med"] is None  # all-NULL group


def test_bucketed_percentiles_null_group_key(spark):
    """A NULL group key must be handled null-safely end-to-end (the
    broadcast bounds join uses <=>); percentile of the NULL-key group
    is computed, not dropped or crashed."""
    from clinical_data_warehouse_bi_spark.queries.core import (
        exact_percentiles_bucketed,
    )

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 5.0), ("a", 7.0), ("a", 9.0)],
        "k string, v double",
    )
    for ndm in (0, 65536):
        rows = {r["k"]: r for r in exact_percentiles_bucketed(
            df, "k", {"v": [(0.5, "med")]}, native_distinct_max=ndm
        )}
        assert rows[None]["med"] == 2.0
        assert rows["a"]["med"] == 7.0


def test_random_hyperplane_recall_beats_axis_aligned(spark):
    """VERDICT r2 gap #4: axis-aligned sign-LSH loses recall when
    embedding dims are correlated/anisotropic (variance concentrated
    in a few components — the shape of real embeddings, where minor
    dims' sign bits are noise between near-duplicates). The seeded
    Rademacher projection mixes the dominant dims into every plane,
    so near-dup pairs keep colliding. Planted-pair recall must show
    the ordering."""
    import numpy as np

    from clinical_data_warehouse_bi_spark.queries.similarity import (
        EMB_DIMS,
        LSH_BANDS,
        LSH_BAND_BITS,
    )
    from clinical_data_warehouse_bi_spark.similarity import (
        axis_matrix,
        rademacher_matrix,
        sign_lsh_bands,
    )

    rng = np.random.RandomState(7)
    n_pairs = 150
    # anisotropic base: 4 dominant dims (unit variance), 60 minor dims
    # (sigma 0.01); near-dup partner adds per-dim noise at the minor
    # dims' own scale — partners agree on dominant structure, minor
    # dims' signs are coin flips
    scale = np.array([1.0] * 4 + [0.01] * (EMB_DIMS - 4))
    base = rng.randn(n_pairs, EMB_DIMS) * scale
    partner = base + rng.randn(n_pairs, EMB_DIMS) * 0.01
    vecs = []
    for i in range(n_pairs):
        vecs.append((2 * i, [float(x) for x in base[i]]))
        vecs.append((2 * i + 1, [float(x) for x in partner[i]]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    planes = LSH_BANDS * LSH_BAND_BITS

    def recall(matrix) -> float:
        rows = sign_lsh_bands(df, matrix, LSH_BANDS, LSH_BAND_BITS).collect()
        sig = {(r["vec_id"], r["band"]): r["sig"] for r in rows}
        hits = sum(
            1
            for i in range(n_pairs)
            if any(
                sig[(2 * i, j)] == sig[(2 * i + 1, j)] for j in range(LSH_BANDS)
            )
        )
        return hits / n_pairs

    r_axis = recall(axis_matrix(planes, EMB_DIMS))
    r_rot = recall(rademacher_matrix(1803, planes, EMB_DIMS))
    assert r_rot >= r_axis, (r_rot, r_axis)
    assert r_rot - r_axis > 0.3, (r_rot, r_axis)  # decisive, not a tie
    assert r_rot > 0.6, r_rot


def test_salt_buckets_self_tune_on_hot_key(spark):
    """VERDICT r2 #5: salted_join(buckets=None) must size its shards
    from the observed key skew so the hottest key's rows plan under
    target_rows_per_task per task, without caller hints."""
    from clinical_data_warehouse_bi_spark.joins import (
        _salted_left,
        estimate_salt_buckets,
        salted_join,
    )

    # one hot key (5000 rows) among cold keys (20 rows each)
    rows = [(0, i) for i in range(5000)] + [
        (k, i) for k in range(1, 11) for i in range(20)
    ]
    left = spark.createDataFrame(rows, "k long, a long").repartition(8)
    right = spark.createDataFrame([(k, k * 10) for k in range(11)], "rk long, b long")

    target = 1000
    buckets = estimate_salt_buckets(left, "k", target_rows_per_task=target)
    assert buckets >= 5  # 5000-row hot key / 1000-per-task

    # the salted relation really does bound rows per (key, salt) task
    per_task = (
        _salted_left(left, buckets)
        .groupBy("k", "__salt")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()["mx"]
    )
    assert per_task <= 2 * target  # miid salt is uniform up to ~2x

    # and the auto-tuned join is still a plain equi-join semantically
    got = sorted(
        (r["k"], r["a"], r["b"])
        for r in salted_join(left, right, "k", "rk", target_rows_per_task=target)
        .collect()
    )
    want = sorted((k, a, k * 10) for k, a in rows)
    assert got == want


def test_salted_join_streaming_requires_explicit_buckets(spark, tmp_path):
    """buckets=None needs an eager probe of `left` — must raise a
    clear error on a streaming frame instead of AnalysisException."""
    import pytest

    from clinical_data_warehouse_bi_spark.joins import salted_join

    spark.createDataFrame([(1, 1)], "k long, a long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema("k long, a long").parquet(
        str(tmp_path / "src")
    )
    right = spark.createDataFrame([(1, 2)], "rk long, b long")
    with pytest.raises(ValueError, match="explicit buckets"):
        salted_join(stream, right, "k", "rk")


def test_range_join_streaming_requires_explicit_bin_width(spark, tmp_path):
    """bin_width=None self-tunes via an eager scan of `right` — must
    raise a clear error on a streaming right side (ADVICE r2)."""
    import pytest

    from clinical_data_warehouse_bi_spark.joins import range_join_binned

    spark.createDataFrame([(0, 5)], "lo long, hi long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "r"))
    stream = spark.readStream.schema("lo long, hi long").parquet(
        str(tmp_path / "r")
    )
    left = spark.createDataFrame([(1, 3)], "pid long, p long")
    with pytest.raises(ValueError, match="bin_width"):
        range_join_binned(left, stream, "p", "lo", "hi")


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=20
    ),
    isolated=st.lists(st.integers(0, 15), min_size=0, max_size=5),
)
@pytest.mark.slow
def test_connected_components_match_union_find(spark, edges, isolated):
    """Min-label propagation must agree with a brute-force union-find
    for any graph, including self-loops, duplicate edges, and
    isolated vertices (singleton components)."""
    from clinical_data_warehouse_bi_spark.graph import connected_components

    e_df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges] or [], "src long, dst long"
    )
    v_ids = sorted({v for e in edges for v in e} | set(isolated))
    v_df = spark.createDataFrame([Row(id=v) for v in v_ids] or [], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(e_df, vertices=v_df).collect()
    }

    parent = {v: v for v in v_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for v in v_ids:
        root = find(v)
        want[v] = min(u for u in v_ids if find(u) == root)
    assert got == want


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=20
    ),
    isolated=st.lists(st.integers(0, 15), min_size=0, max_size=5),
)
@pytest.mark.slow
def test_star_components_match_union_find(spark, edges, isolated):
    """The large-star/small-star path must agree with brute-force
    union-find on arbitrary graphs — same contract as label
    propagation, reachable both explicitly and via auto-fallback."""
    from clinical_data_warehouse_bi_spark.graph import connected_components

    e_df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges] or [], "src long, dst long"
    )
    v_ids = sorted({v for e in edges for v in e} | set(isolated))
    v_df = spark.createDataFrame([Row(id=v) for v in v_ids] or [], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(e_df, vertices=v_df, algorithm="star").collect()
    }

    parent = {v: v for v in v_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for v in v_ids:
        root = find(v)
        want[v] = min(u for u in v_ids if find(u) == root)
    assert got == want


def test_raw_md5_dedup_matches_duckdb(spark, sf_dir, duck):
    """Raw-content-hash dedup (the unregistered q_dedup_exact form)
    keeps a direct cross-engine VALUE check after its round-5 registry
    retirement: its witness q_corpus_clean hashes NORMALIZED text, so
    this pins the raw md5(text) expression itself against DuckDB."""
    from clinical_data_warehouse_bi_spark.queries.dedup import q_dedup_exact

    got = {
        r["text_hash"]: (r["n_copies"], r["keep_doc_id"])
        for r in q_dedup_exact(spark, sf_dir).collect()
    }
    want = {
        h: (n, k)
        for h, n, k in duck.execute(
            "SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,"
            " MIN(doc_id) AS keep_doc_id FROM documents GROUP BY md5(text)"
        ).fetchall()
    }
    assert got == want


@pytest.mark.slow
def test_deep_chain_converges_via_star_fallback(spark):
    """A path graph far deeper than max_iter must still return correct
    components: auto PLATEAU-bails to large-star/small-star after a
    few non-halving rounds (NOT after burning all max_iter actions —
    each propagation round is a full job barrier), and star converges
    in O(log^2 n) rounds regardless of the 80-hop diameter.
    label_prop alone must refuse with a clear error."""
    import pytest

    from clinical_data_warehouse_bi_spark.graph import connected_components

    n = 80  # diameter 79 >> any reasonable round budget
    e_df = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(e_df, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # a chain's changed-count shrinks by ~1/round, never halving: the
    # plateau heuristic must bail at its 4-round window, not at 25
    assert stats["fell_back"] is True
    assert stats["label_prop_rounds"] <= 6

    with pytest.raises(RuntimeError, match="large-star/small-star"):
        connected_components(e_df, max_iter=5, algorithm="label_prop")

    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(e_df, algorithm="bogus")


def test_shallow_graph_converges_without_fallback(spark):
    """The dedup-cluster shape (stars of duplicates around a common
    ancestor) must keep converging inside label propagation — the
    plateau heuristic may never trigger on it (its changed-count hits
    zero within a few rounds)."""
    from clinical_data_warehouse_bi_spark.graph import connected_components

    edges = [Row(src=h, dst=h * 100 + i) for h in (1, 2, 3) for i in range(1, 6)]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(e_df, stats=stats).collect()
    }
    want = {h: h for h in (1, 2, 3)}
    want.update({h * 100 + i: h for h in (1, 2, 3) for i in range(1, 6)})
    assert got == want
    assert stats["fell_back"] is False
    assert stats["label_prop_rounds"] <= 4


def test_pack_sequences_offsets_contiguous(spark, sf_dir):
    """Packing invariants per shard: offsets start at 0, each doc
    begins exactly where the previous ended (no token gaps or
    overlaps — the property that makes concat-and-chunk training
    batches valid), and chunk spans match the offset arithmetic."""
    from clinical_data_warehouse_bi_spark.queries.text_ops import (
        PACK_CTX,
        q_pack_sequences,
    )

    rows = q_pack_sequences(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert by_shard
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in docs:
            assert r.tok_offset == expect, (shard, r)
            assert r.n_tokens > 0
            assert r.first_chunk == r.tok_offset // PACK_CTX
            assert r.last_chunk == (r.tok_offset + r.n_tokens - 1) // PACK_CTX
            assert r.n_chunks == r.last_chunk - r.first_chunk + 1
            expect += r.n_tokens


def test_scd2_intervals_partition_history(spark, sf_dir):
    """SCD2 invariants per customer: versions are ordered, half-open
    validity intervals chain exactly (valid_to == next valid_from),
    exactly one current version (NULL valid_to), and consecutive
    versions always differ in state (change compression)."""
    from clinical_data_warehouse_bi_spark.queries.windows import q_scd2_dim

    rows = q_scd2_dim(spark, sf_dir).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.customer_id, []).append(r)
    assert by_cust
    for cust, vers in by_cust.items():
        vers.sort(key=lambda r: r.valid_from)
        currents = [r for r in vers if r.valid_to is None]
        assert len(currents) == 1, cust
        assert vers[-1].valid_to is None
        for a, b in zip(vers, vers[1:]):
            assert a.valid_to == b.valid_from, (cust, a, b)
            assert a.state != b.state, (cust, a, b)
            assert a.is_current is False


def test_chunk_manifest_covers_every_context(spark, sf_dir):
    """The exploded chunk manifest must tile each shard's token
    stream exactly: every chunk holds ctx tokens (tail chunk <= ctx),
    slices are in-bounds, non-empty, and sum back to each document's
    token count."""
    from clinical_data_warehouse_bi_spark.queries.text_ops import (
        PACK_CTX,
        q_pack_sequences,
    )
    from clinical_data_warehouse_bi_spark.text import chunk_manifest

    packed = q_pack_sequences(spark, sf_dir)
    rows = chunk_manifest(packed, PACK_CTX).collect()
    per_chunk: dict[tuple, int] = {}
    per_doc: dict[int, int] = {}
    max_chunk: dict[int, int] = {}
    for r in rows:
        n = r.tok_end - r.tok_start
        assert 0 < n <= PACK_CTX
        per_chunk[(r.shard, r.chunk_id)] = per_chunk.get((r.shard, r.chunk_id), 0) + n
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + n
        max_chunk[r.shard] = max(max_chunk.get(r.shard, -1), r.chunk_id)
    for (shard, chunk), n in per_chunk.items():
        if chunk < max_chunk[shard]:
            assert n == PACK_CTX, (shard, chunk, n)
        else:
            assert 0 < n <= PACK_CTX
    want = {r.doc_id: r.n_tokens for r in packed.collect()}
    assert per_doc == want


def test_chunk_dedup_idempotent_and_exhaustive(spark, sf_dir):
    """Re-applying chunk_dedup to its own output must remove nothing
    (every surviving chunk is globally unique, and chunk boundaries
    are preserved because only trailing chunks are partial), and the
    total kept-chunk count must equal the number of DISTINCT chunks
    in the corpus — dedup removes exactly the duplicates, no more."""
    from clinical_data_warehouse_bi_spark import text as T
    from clinical_data_warehouse_bi_spark.io import load_tables
    from clinical_data_warehouse_bi_spark.queries.dedup import CHUNK_TOKENS

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    once = T.chunk_dedup(docs, chunk_tokens=CHUNK_TOKENS).cache()

    # exhaustive: sum(n_kept) == count of distinct chunk strings
    n_kept_total = once.agg(F.sum("n_kept")).first()[0]
    distinct_chunks = (
        docs.select(T.tokens("text").alias("w"))
        .filter(F.size("w") > 0)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast((size(w) + {CHUNK_TOKENS - 1})"
                    f" div {CHUNK_TOKENS} as int) - 1),"
                    f" i -> concat_ws(' ', slice(w, i*{CHUNK_TOKENS}+1, {CHUNK_TOKENS})))"
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert n_kept_total == distinct_chunks

    # idempotence: second application keeps every chunk of every doc
    twice = T.chunk_dedup(
        once.select("doc_id", F.col("clean_text").alias("text")),
        chunk_tokens=CHUNK_TOKENS,
    )
    changed = twice.filter(F.col("n_kept") != F.col("n_chunks")).count()
    assert changed == 0
    # and the rebuilt text itself is a fixed point
    joined = (
        once.select("doc_id", F.col("clean_text").alias("t1"))
        .join(twice.select("doc_id", F.col("clean_text").alias("t2")), "doc_id")
        .filter(F.col("t1") != F.col("t2"))
    )
    assert joined.count() == 0
    once.unpersist()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_fuzzy_blocked_pairs_match_brute_force(spark):
    """fuzzy_blocked_pairs must equal the brute-force model: all
    a<b pairs within equal blocks at edit distance <= k — including
    pairs the length-band prune must NOT lose (distance exactly k via
    pure insertions) and excluding cross-block near-identical names."""
    rows = [
        # block (1, 'A'): a typo cluster
        (1, "mercer", 1, "A"),
        (2, "merced", 1, "A"),     # sub, dist 1
        (3, "mercersburg", 1, "A"),  # 6 inserts, dist 6: pruned
        (4, "merce", 1, "A"),      # deletion, dist 1
        (5, "xavier", 1, "A"),     # far
        # same name, different block: must NOT pair with doc 1
        (6, "mercer", 2, "A"),
        (7, "mercer!!", 2, "A"),   # dist 2 from mercer via 2 inserts
        # block (1, 'B')
        (8, "smith", 1, "B"),
        (9, "smyth", 1, "B"),      # dist 1
        (10, "smithee", 1, "B"),   # dist 2 (2 inserts — length-band edge)
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, nk int, seg string")
    got = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in joins.fuzzy_blocked_pairs(
            df, id_col="id", name_col="name", block_cols=["nk", "seg"], max_dist=2
        ).collect()
    }
    expected = set()
    for i, (ia, na, ka, sa) in enumerate(rows):
        for ib, nb, kb, sb in rows[i + 1:]:
            if (ka, sa) == (kb, sb) and ia < ib:
                d = _lev(na, nb)
                if d <= 2:
                    expected.add((ia, ib, d))
    assert got == expected
    assert (6, 7, 2) in expected  # the pure-insertion distance-2 pair survived


def test_incremental_near_dup_matches_full_rebuild(spark, sf_dir):
    """The steady-state ingest path must find EXACTLY the pairs the
    from-scratch rebuild finds, restricted to pairs that involve the
    new batch — banding only the batch and probing the stored corpus
    index loses nothing (same band family, same signatures)."""
    from clinical_data_warehouse_bi_spark import text as T
    from clinical_data_warehouse_bi_spark.io import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)

    full = {
        (r.doc_a, r.doc_b)
        for r in T.lsh_candidate_pairs(T.lsh_index(docs)).collect()
    }
    # corpus ids < 400 <= batch ids, so any pair touching the batch
    # has doc_b in the batch
    expected = {
        (a, b, "corpus-batch" if a < 400 else "batch")
        for a, b in full
        if b >= 400
    }
    got = {
        (r.doc_a, r.doc_b, r.origin)
        for r in T.incremental_near_dup_pairs(
            batch, T.lsh_index(corpus)
        ).collect()
    }
    assert got == expected
    assert any(o == "corpus-batch" for _, _, o in got) or not expected


@pytest.mark.slow
def test_incremental_verify_jaccard_matches_python(spark, sf_dir):
    """Exact Jaccard on incremental candidates vs an independent
    Python computation over the same documents."""
    from clinical_data_warehouse_bi_spark import text as T
    from clinical_data_warehouse_bi_spark.io import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    pairs = T.incremental_near_dup_pairs(batch, T.lsh_index(corpus))
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in T.incremental_verify_jaccard(pairs, corpus, batch).collect()
    }
    assert len(got) == pairs.count()

    import re

    texts = {r.doc_id: r.text for r in docs.collect()}

    def sh_set(t: str) -> set:
        w = re.findall(r"[a-z0-9]+", t.lower())
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    for (a, b), j in got.items():
        sa, sb = sh_set(texts[a]), sh_set(texts[b])
        expect = len(sa & sb) / len(sa | sb)
        assert abs(j - expect) < 1e-12, (a, b, j, expect)


def test_profile_table_matches_duckdb(spark, sf_dir, duck):
    """qa.profile_table vs a hand-written DuckDB profile of the same
    columns: counts exact; min/max computed on the NATIVE type in
    both engines (numeric/date ordering — the round-7 advice catch:
    a lexicographic min over string casts reports max '9.0' for a
    quantity column reaching 50) and only rendered as strings."""
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.qa import profile_table

    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    li = read_table(spark, sf_dir, "lineitem")
    got = {
        r.column: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in profile_table(li, cols).collect()
    }
    # the numeric column's max must be numerically largest, not
    # lexicographically largest
    assert float(got["l_quantity"][4]) >= 10.0
    for c in cols:
        row = duck.execute(
            f"SELECT count(*), sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),"
            f" count(DISTINCT {c}),"
            f" CAST(min({c}) AS VARCHAR), CAST(max({c}) AS VARCHAR)"
            " FROM lineitem"
        ).fetchone()
        assert got[c] == (
            row[0],
            row[1] or 0,
            row[2],
            row[3],
            row[4],
        ), (c, got[c], row)


def test_paragraph_dedup_matches_python_model(spark):
    """paragraph_dedup vs a direct Python model on constructed docs:
    within-doc repeats, cross-doc repeats, whitespace-only lines,
    docs reduced to empty, and delimiter preservation."""
    from clinical_data_warehouse_bi_spark import text as T

    docs = [
        (1, "intro\ncommon disclaimer\nbody one"),
        (2, "common disclaimer\nbody two\n\n  \nbody two"),
        (3, "common disclaimer"),
        (4, "   \n\n"),
        (5, "intro\nbody one"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in T.paragraph_dedup(df).collect()
    }

    seen: set[str] = set()
    expect = {}
    for did, text in docs:
        units = text.split("\n")
        nonempty = [u for u in units if u.strip() != ""]
        kept = []
        for u in units:
            if u.strip() == "":
                continue
            if u not in seen:
                seen.add(u)
                kept.append(u)
        expect[did] = (len(nonempty), len(kept), "\n".join(kept))
    assert got == expect
    # the interesting cases really occurred
    assert expect[2][1] == 1  # cross-doc dup dropped + in-doc repeat dropped
    assert expect[3] == (1, 0, "")  # doc reduced to empty
    assert expect[4] == (0, 0, "")  # whitespace-only doc

    # idempotence on the rebuilt corpus
    rebuilt = spark.createDataFrame(
        [(k, v[2]) for k, v in expect.items()], "doc_id long, text string"
    )
    again = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in T.paragraph_dedup(rebuilt).collect()
    }
    for did, (np_, nk, ct) in again.items():
        assert np_ == nk and ct == expect[did][2], (did, again[did])


def test_funnel_matches_duckdb_sequential_min(spark, sf_dir, duck):
    """funnel_steps' greedy fold vs the declarative sequential-min
    definition in DuckDB (correlated mins with strict progression) on
    the real events table — every user, every step timestamp."""
    from clinical_data_warehouse_bi_spark.funnel import funnel_steps
    from clinical_data_warehouse_bi_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    got = {
        r.user_id: (r.steps_completed, r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    oracle = duck.execute("""
        WITH u AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type IN ('view','click','purchase')),
        s1 AS (SELECT u.user_id,
                 (SELECT min(ts) FROM events e WHERE e.user_id = u.user_id
                    AND e.event_type = 'view') AS ts1 FROM u),
        s2 AS (SELECT s1.*,
                 (SELECT min(ts) FROM events e WHERE e.user_id = s1.user_id
                    AND e.event_type = 'click' AND e.ts > s1.ts1) AS ts2 FROM s1),
        s3 AS (SELECT s2.*,
                 (SELECT min(ts) FROM events e WHERE e.user_id = s2.user_id
                    AND e.event_type = 'purchase' AND e.ts > s2.ts2) AS ts3 FROM s2)
        SELECT user_id, ts1, ts2, ts3 FROM s3
    """).fetchall()
    assert len(got) == len(oracle)
    for user_id, ts1, ts2, ts3 in oracle:
        n = 3 if ts3 else (2 if ts2 else (1 if ts1 else 0))
        assert got[user_id] == (n, ts1, ts2, ts3), (user_id, got[user_id], (n, ts1, ts2, ts3))
    # the fixture actually exercises full completion
    assert any(v[0] == 3 for v in got.values())


def test_funnel_steps_escapes_quoted_step_names(spark):
    """Step names are data: one containing a single quote (and a
    backslash) must flow through the fold expression intact rather
    than breaking the SQL parse (round-7 advice)."""
    from datetime import datetime

    from clinical_data_warehouse_bi_spark.funnel import funnel_steps

    s1, s2 = "add'l info", "done\\now"
    ev = spark.createDataFrame(
        [
            (1, s1, datetime(2024, 1, 1, 10)),
            (1, s2, datetime(2024, 1, 1, 11)),
            (2, s2, datetime(2024, 1, 1, 9)),  # wrong order: stalls at 0
        ],
        "user_id long, event_type string, ts timestamp",
    )
    got = {
        r.user_id: r.steps_completed
        for r in funnel_steps(ev, [s1, s2]).collect()
    }
    assert got == {1: 2, 2: 0}


def test_paragraph_dedup_regex_metachar_delimiter(spark):
    """A '.' or '|' delimiter must split on the literal character,
    not per-character as a regex (round-7 advice), and the rebuild
    must re-join with the same literal."""
    from clinical_data_warehouse_bi_spark import text as T

    docs = spark.createDataFrame(
        [(1, "alpha.common.beta"), (2, "common.gamma")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in T.paragraph_dedup(docs, delim=".").collect()
    }
    assert got[1] == (3, 3, "alpha.common.beta")
    assert got[2] == (2, 1, "gamma")

    pipe = spark.createDataFrame(
        [(1, "a|b"), (2, "b|c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.clean_text
        for r in T.paragraph_dedup(pipe, delim="|").collect()
    }
    assert got == {1: "a|b", 2: "c"}


def test_lm_perplexity_semantics(spark):
    """Planted corpus: a document made of the corpus's dominant
    pattern must score LOWER perplexity than a document of unique
    gibberish; sub-2-token docs score NULL; an externally supplied
    model scores a held-out doc identically to retraining."""
    from clinical_data_warehouse_bi_spark import lm

    common = "the cat sat on the mat " * 10
    docs = spark.createDataFrame(
        [
            (1, common),
            (2, common),
            (3, "zq xv qj wk vz kx jq"),  # unseen-elsewhere bigrams
            (4, "word"),  # single token -> no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.ppl) for r in lm.perplexity(docs).collect()}
    assert got[4][1] is None and got[4][0] == 1
    assert got[1][1] == got[2][1]  # identical docs, identical score
    assert got[1][1] < got[3][1]  # fluent << gibberish

    # external-model path: score doc 3 under the model of docs 1-2.
    # Every bigram is unseen there, so each scores the pure smoothing
    # mass alpha/(alpha*V) = 1/V and the perplexity is EXACTLY V (the
    # training vocabulary: the, cat, sat, on, mat -> 5.0)
    model = lm.bigram_counts(docs.filter(F.col("doc_id") < 3))
    ext = {
        r.doc_id: r.ppl
        for r in lm.perplexity(
            docs.filter(F.col("doc_id") == 3), model=model
        ).collect()
    }
    assert ext[3] == 5.0


def test_quota_sample_matches_duckdb(spark, sf_dir, duck):
    """text.quota_sample vs the same row_number construction in
    DuckDB on the real documents table: identical kept doc set for
    the hash-priority form AND the quality-priority form."""
    from clinical_data_warehouse_bi_spark import text as T
    from clinical_data_warehouse_bi_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = sorted(
        r.doc_id for r in T.quota_sample(docs, "source", 30).collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute("""
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents) t WHERE rn <= 30
        """).fetchall()
    )
    assert got == want and len(got) > 0

    got_q = sorted(
        r.doc_id
        for r in T.quota_sample(
            docs, "source", 30, priority_col="n_chars"
        ).collect()
    )
    want_q = sorted(
        r[0]
        for r in duck.execute("""
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY source
                ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) t WHERE rn <= 30
        """).fetchall()
    )
    assert got_q == want_q
    # every group capped, none emptied
    from collections import Counter

    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    by_group = Counter(src[d] for d in got)
    assert max(by_group.values()) <= 30
    assert set(by_group) == set(src.values())


def test_cohort_retention_matches_duckdb(spark, sf_dir, duck):
    """funnel.cohort_retention vs the same cohort construction in
    DuckDB over the real events table: identical retention matrix."""
    from clinical_data_warehouse_bi_spark.funnel import cohort_retention
    from clinical_data_warehouse_bi_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    got = {
        (str(r.cohort), r.month_offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    want = {
        (str(c), int(o)): n
        for c, o, n in duck.execute("""
            WITH c AS (SELECT user_id,
                              date_trunc('month', min(ts)) AS cohort
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT e.user_id, c.cohort,
                         datediff('month', c.cohort,
                                  date_trunc('month', e.ts)) AS off
                  FROM events e JOIN c USING (user_id))
            SELECT CAST(cohort AS DATE), off, count(*)
            FROM a GROUP BY 1, 2
        """).fetchall()
    }
    assert got == want and len(got) > 0
    # offset-0 row exists for every cohort (a user is active in their
    # own first month by construction)
    assert all((c, 0) in got for c, o in got if o == 0)


def test_resample_fill_matches_duckdb(spark, sf_dir, duck):
    """timeseries.resample_fill vs DuckDB generate_series + window
    forward-fill on real per-user daily event values: dense grid,
    exact bucket sums, ffill semantics, and the zero/null policies."""
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.timeseries import resample_fill

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    got = {
        (r.user_id, str(r.bucket)): (r.n_obs, r.value)
        for r in resample_fill(ev).collect()
    }
    want = {}
    for u, b, n, v in duck.execute("""
        WITH ob AS (
          SELECT user_id, date_trunc('day', ts) AS b,
                 count(*) AS n, sum(value) AS v
          FROM events WHERE user_id < 30 GROUP BY 1, 2),
        spans AS (SELECT user_id, min(b) AS lo, max(b) AS hi
                  FROM ob GROUP BY 1),
        grid AS (SELECT user_id, unnest(generate_series(lo, hi,
                        INTERVAL 1 DAY)) AS b FROM spans),
        dense AS (
          SELECT g.user_id, g.b, coalesce(ob.n, 0) AS n, ob.v
          FROM grid g LEFT JOIN ob
            ON ob.user_id = g.user_id AND ob.b = g.b)
        SELECT user_id, b, n,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY b
                 ROWS UNBOUNDED PRECEDING) AS v
        FROM dense
    """).fetchall():
        want[(u, str(b))] = (n, v)
    assert set(got) == set(want)
    for k in want:
        gn, gv = got[k]
        wn, wv = want[k]
        assert gn == wn, (k, got[k], want[k])
        assert (gv is None) == (wv is None), (k, got[k], want[k])
        if wv is not None:
            assert abs(gv - wv) < 1e-9, (k, got[k], want[k])
    # the grid really is dense and the policies differ where expected
    import collections

    per_user = collections.Counter(u for u, _ in got)
    assert max(per_user.values()) > 1
    zero = {
        (r.user_id, str(r.bucket)): r.value
        for r in resample_fill(ev, how="zero").collect()
    }
    nul = {
        (r.user_id, str(r.bucket)): r.value
        for r in resample_fill(ev, how="null").collect()
    }
    gaps = [k for k in got if got[k][0] == 0]
    assert gaps, "fixture produced no gap buckets"
    for k in gaps:
        assert zero[k] == 0.0 and nul[k] is None


@settings(**SETTINGS)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 3),          # key
            st.integers(0, 12),         # day offset
            st.integers(-5, 5),         # value
        ),
        min_size=1,
        max_size=25,
    ),
    how=st.sampled_from(["ffill", "zero", "null"]),
)
@pytest.mark.slow
def test_resample_fill_matches_python_model(spark, obs, how):
    """resample_fill vs a direct Python model on random sparse
    series: dense per-key grid over the key's own span, bucket sums,
    and all three gap policies — including duplicate observations in
    one bucket and single-observation keys."""
    from datetime import datetime, timedelta

    from clinical_data_warehouse_bi_spark.timeseries import resample_fill

    base = datetime(2024, 5, 1)
    rows = [
        (k, base + timedelta(days=d, hours=(v % 3)), float(v))
        for k, d, v in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.bucket.date()): (r.n_obs, r.value)
        for r in resample_fill(df, how=how).collect()
    }

    want = {}
    by_key: dict[int, dict] = {}
    for k, ts, v in rows:
        by_key.setdefault(k, {}).setdefault(ts.date(), []).append(v)
    for k, buckets in by_key.items():
        lo, hi = min(buckets), max(buckets)
        last = None
        d = lo
        while d <= hi:
            vs = buckets.get(d)
            if vs is not None:
                last = sum(vs)
                want[(k, d)] = (len(vs), last)
            else:
                fill = {"ffill": last, "zero": 0.0, "null": None}[how]
                want[(k, d)] = (0, fill)
            d += timedelta(days=1)
    assert set(got) == set(want)
    for key in want:
        gn, gv = got[key]
        wn, wv = want[key]
        assert gn == wn, (key, got[key], want[key])
        if wv is None:
            assert gv is None, (key, got[key], want[key])
        else:
            assert gv is not None and abs(gv - wv) < 1e-9, (
                key, got[key], want[key],
            )


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 3)),  # (id, group)
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 5),
)
@pytest.mark.slow
def test_quota_sample_idempotent_and_capped(spark, docs, n):
    """quota_sample is deterministic, idempotent (re-capping the
    capped output changes nothing), and never exceeds n per group or
    drops a group entirely."""
    from collections import Counter

    from clinical_data_warehouse_bi_spark import text as T

    df = spark.createDataFrame(
        [(i, f"g{g}") for i, g in docs] or [], "doc_id long, source string"
    )
    once = T.quota_sample(df, "source", n)
    ids1 = sorted(r.doc_id for r in once.collect())
    ids2 = sorted(r.doc_id for r in T.quota_sample(df, "source", n).collect())
    assert ids1 == ids2  # deterministic
    twice = sorted(
        r.doc_id for r in T.quota_sample(once, "source", n).collect()
    )
    assert twice == ids1  # idempotent
    by_g = Counter(g for i, g in docs if i in set(ids1))
    groups = {g for _, g in docs}
    assert all(v <= n for v in by_g.values())
    assert {g for g in by_g} == groups or not docs


def test_correlation_matrix_matches_duckdb(spark, sf_dir, duck):
    """qa.correlation_matrix vs DuckDB corr() on lineitem numerics:
    every unordered pair, rounded coefficients equal."""
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.qa import correlation_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = read_table(spark, sf_dir, "lineitem")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(li, cols).collect()
    }
    assert len(got) == 6
    for (a, b), g in got.items():
        w = duck.execute(
            f"SELECT round(corr({a}, {b}), 6) FROM lineitem"
        ).fetchone()[0]
        assert g is not None and abs(g - w) < 2e-6, (a, b, g, w)
    # the driver's synthetic columns are mutually independent draws,
    # so every coefficient is near zero — which is itself the
    # regression signal a broken feed (duplicated column, join
    # fan-out) would flip
    assert all(abs(v) < 0.2 for v in got.values())


# ------------------------- content-defined chunk dedup (CDC, r8) --

from clinical_data_warehouse_bi_spark import text as T  # noqa: E402
from clinical_data_warehouse_bi_spark.io import read_table  # noqa: E402

_CDC_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five "
    "six seven eight nine ten"
)


def test_cdc_chunk_dedup_survives_prefix_insertion(spark):
    """The CDC contract: inserting a prefix shifts every fixed-window
    chunk (fixed dedup finds NOTHING to remove from the copy) but
    leaves content-defined boundaries downstream intact (CDC removes
    the shared tail)."""
    docs = spark.createDataFrame(
        [(0, _CDC_BASE), (1, "inserted prefix words here " + _CDC_BASE)],
        ["doc_id", "text"],
    )
    cdc = {r["doc_id"]: r for r in T.cdc_chunk_dedup(docs).collect()}
    fixed = {r["doc_id"]: r for r in T.chunk_dedup(docs).collect()}
    # fixed windows: the shifted copy shares no chunk with the original
    assert fixed[1]["n_kept"] == fixed[1]["n_chunks"]
    # CDC: most of the copy's chunks resynchronize and dedup away
    assert cdc[1]["n_kept"] < cdc[1]["n_chunks"]
    assert cdc[1]["n_kept"] <= fixed[1]["n_kept"] - 1
    # the original is globally first: it keeps everything
    assert cdc[0]["n_kept"] == cdc[0]["n_chunks"]


def test_cdc_chunk_dedup_exact_copy_fully_removed(spark):
    docs = spark.createDataFrame(
        [(0, _CDC_BASE), (1, _CDC_BASE)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in T.cdc_chunk_dedup(docs).collect()}
    assert got[0]["n_kept"] == got[0]["n_chunks"]
    assert got[1]["n_kept"] == 0 and got[1]["clean_text"] == ""


def test_cdc_chunk_dedup_lossless_without_duplicates(spark):
    """A corpus with no repeated chunks reconstructs verbatim (the
    chunks partition the token stream)."""
    docs = spark.createDataFrame([(0, _CDC_BASE)], ["doc_id", "text"])
    r = T.cdc_chunk_dedup(docs).first()
    assert r["n_kept"] == r["n_chunks"]
    assert r["clean_text"] == _CDC_BASE


def test_cdc_chunk_dedup_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(200)
    a = sorted(map(tuple, T.cdc_chunk_dedup(docs).collect()))
    b = sorted(map(tuple, T.cdc_chunk_dedup(docs).collect()))
    assert a == b


def test_cdc_chunk_dedup_text_never_shuffles(spark, sf_dir):
    """Same scale contract as q_chunk_dedup: only the slim
    (id, pos, h1, h2) relation reaches a keyed exchange — never the
    text, token array, or chunk-string array."""
    from test_plans import _exchange_blocks

    docs = read_table(spark, sf_dir, "documents")
    blocks = [
        b
        for b in _exchange_blocks(T.cdc_chunk_dedup(docs))
        if "RoundRobinPartitioning" not in b
    ]
    assert blocks, "expected at least one keyed exchange (keep-first window)"
    for b in blocks:
        assert "text#" not in b, b
        assert " w#" not in b and "[w#" not in b, b
        assert "__chunks#" not in b, b


@pytest.mark.slow
def test_normalize_unicode_folds_and_is_idempotent(spark):
    docs = spark.createDataFrame(
        [
            (0, "Café résumé"),          # accents
            (1, "ﬁne ﬂow"),                  # fi/fl ligatures
            (2, "ＨＥＬＬＯ"),     # fullwidth HELLO
            (3, None),
        ],
        ["doc_id", "text"],
    )
    once = {r["doc_id"]: r["text"] for r in T.normalize_unicode(docs).collect()}
    assert once[0] == "Cafe resume"
    assert once[1] == "fine flow"
    assert once[2] == "HELLO"
    assert once[3] is None
    twice = {
        r["doc_id"]: r["text"]
        for r in T.normalize_unicode(T.normalize_unicode(docs)).collect()
    }
    assert twice == once
    # schema preserved, pure map
    assert T.normalize_unicode(docs).columns == docs.columns


def test_weighted_sample_matches_duckdb_twin(spark, sf_dir, duck):
    """The A-ES priority sample is engine-portable: DuckDB recomputes
    the identical sample from the same md5-derived uniforms."""
    docs = read_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", ((F.col("doc_id") % 7) + 1).cast("double").alias("w")
    )
    got = sorted(
        r["doc_id"]
        for r in T.weighted_sample(weighted, 50, "w").collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute("""
            SELECT doc_id FROM (
              SELECT doc_id,
                     pow((('0x' || substr(md5('ws0:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1.0)
                         / 4294967297.0,
                         1.0 / ((doc_id % 7) + 1.0)) AS pri
              FROM documents)
            ORDER BY pri DESC, doc_id ASC LIMIT 50
        """).fetchall()
    )
    assert got == want


@pytest.mark.slow
def test_weighted_sample_favors_heavy_weights(spark):
    """Inclusion frequency tracks weight: across many disjoint seeds,
    a weight-9 row appears far more often than a weight-1 row."""
    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    heavy = light = 0
    for s in range(15):
        ids = {r["doc_id"] for r in T.weighted_sample(df, 20, "w", seed=f"s{s}").collect()}
        heavy += sum(1 for i in ids if i < 10)
        light += sum(1 for i in ids if i >= 10)
    # 10 heavy rows at w=9 vs 90 light at w=1: heavy per-row rate
    # must dominate light per-row rate decisively
    assert heavy / 10 > 3 * (light / 90)


def test_weighted_sample_deterministic_and_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, 5.0), (5, 2.0)], ["doc_id", "w"]
    )
    a = sorted(r["doc_id"] for r in T.weighted_sample(df, 3, "w").collect())
    b = sorted(r["doc_id"] for r in T.weighted_sample(df, 3, "w").collect())
    assert a == b == sorted(a)
    assert 2 not in a and 3 not in a  # nonpositive weights excluded
    assert len(a) == 3


def test_ewma_anomalies_matches_python_model(spark):
    """The distributed fold reproduces a driver-side EWMA control
    chart point-for-point (pre-point estimates, warmup, flags)."""
    import datetime as dt

    rows = []
    series = {
        1: [10.0, 10.2, 9.9, 10.1, 10.0, 50.0, 10.1, 9.8],  # one spike
        2: [5.0, 5.1, 4.9, 5.05, 5.0, 5.1],                 # calm
    }
    for k, vs in series.items():
        for i, v in enumerate(vs):
            rows.append((k, dt.datetime(2024, 1, 1 + i), v))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    from clinical_data_warehouse_bi_spark import timeseries as TS

    got = {
        (r["user_id"], r["ts"]): (r["ewma"], r["dev"], r["is_anomaly"])
        for r in TS.ewma_anomalies(df, alpha=0.3, k_sigma=3.0, warmup=3).collect()
    }
    a = 0.3
    for k, vs in series.items():
        ewma = ewd = None
        n = 0
        for i, v in enumerate(vs):
            ts = dt.datetime(2024, 1, 1 + i)
            g_ewma, g_dev, g_an = got[(k, ts)]
            if n == 0:
                assert g_ewma is None and g_dev is None and g_an is False
                ewma, ewd = v, 0.0
            else:
                assert abs(g_ewma - ewma) < 1e-12
                assert abs(g_dev - ewd) < 1e-12
                want_an = n >= 3 and ewd > 0 and abs(v - ewma) > 3.0 * ewd
                assert g_an == want_an, (k, i)
                ewma, ewd = (
                    a * v + (1 - a) * ewma,
                    a * abs(v - ewma) + (1 - a) * ewd,
                )
            n += 1
    # the spike (and only the spike) flags in series 1; calm never
    flags = {(k, t) for (k, t), (_, _, an) in got.items() if an}
    assert flags == {(1, dt.datetime(2024, 1, 6))}


def test_ewma_anomalies_single_key_exchange(spark, sf_dir):
    """One keyed exchange (the groupBy collect), nothing else."""
    from test_plans import _exchange_blocks

    from clinical_data_warehouse_bi_spark import timeseries as TS
    from clinical_data_warehouse_bi_spark.io import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.col("event_id").cast("double").alias("value")
    )
    blocks = [
        b
        for b in _exchange_blocks(TS.ewma_anomalies(ev))
        if "RoundRobinPartitioning" not in b
    ]
    assert len(blocks) == 1


@settings(**SETTINGS)
@given(
    li=st.lists(st.tuples(st.integers(0, 40), st.integers(0, 12)), min_size=0, max_size=10),
    ri=st.lists(st.tuples(st.integers(0, 40), st.integers(0, 12)), min_size=0, max_size=10),
    width=st.sampled_from([1, 4, 9, 16]),
)
@pytest.mark.slow
def test_interval_overlap_join_equals_brute_force(spark, li, ri, width):
    """Binned interval-overlap join == the O(L x R) predicate, every
    true pair exactly once, for any bin width."""
    l_df = spark.createDataFrame(
        [Row(lid=i, llo=lo, lhi=lo + ln) for i, (lo, ln) in enumerate(li)] or [],
        "lid int, llo int, lhi int",
    )
    r_df = spark.createDataFrame(
        [Row(rid=i, rlo=lo, rhi=lo + ln) for i, (lo, ln) in enumerate(ri)] or [],
        "rid int, rlo int, rhi int",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in joins.interval_overlap_join_binned(
            l_df, r_df, "llo", "lhi", "rlo", "rhi", width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (llo, lln) in enumerate(li)
        for j, (rlo, rln) in enumerate(ri)
        if llo <= rlo + rln and rlo <= llo + lln
    )
    assert got == want


def test_interval_overlap_join_is_not_nested_loop(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("lid"),
        F.col("user_id").alias("llo"),
        (F.col("user_id") + 5).alias("lhi"),
    )
    rv = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("rid"),
        F.col("user_id").alias("rlo"),
        (F.col("user_id") + 3).alias("rhi"),
    )
    from test_plans import physical_plan

    plan = physical_plan(
        joins.interval_overlap_join_binned(ev, rv, "llo", "lhi", "rlo", "rhi", 8)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_survivorship_rules(spark):
    rows = [
        # cluster 1: three partial records, order by rec_id
        (1, 1, None, "Bob", 170, "b@x.io"),
        (1, 2, "Robert", "B", 172, None),
        (1, 3, "Rob", None, 168, "robert@corp.example"),
        # cluster 2: single record
        (2, 4, "Ada", "Ada L", 160, None),
    ]
    df = spark.createDataFrame(
        rows, "cluster long, rec_id long, name string, nick string,"
        " height long, email string"
    )
    got = {
        r["cluster"]: r
        for r in joins.survivorship(
            df,
            "cluster",
            {
                "name": "first_non_null",
                "nick": "longest",
                "height": "max",
                "email": "first_non_null",
            },
            order_col="rec_id",
        ).collect()
    }
    assert got[1]["name"] == "Robert"       # first record with a name
    assert got[1]["nick"] == "Bob"          # longest string wins
    assert got[1]["height"] == 172
    assert got[1]["email"] == "b@x.io"      # earliest non-null
    assert got[2]["name"] == "Ada"
    # one row per cluster; unknown rule rejected
    assert len(got) == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        joins.survivorship(df, "cluster", {"name": "median"})


def test_survivorship_single_aggregation(spark, sf_dir):
    from test_plans import _exchange_blocks

    df = read_table(spark, sf_dir, "customer")
    blocks = [
        b
        for b in _exchange_blocks(
            joins.survivorship(
                df.withColumn("cluster", F.col("c_custkey") % 100),
                "cluster",
                {"c_name": "longest", "c_acctbal": "max"},
                order_col="c_custkey",
            )
        )
        if "RoundRobinPartitioning" not in b
    ]
    assert len(blocks) == 1  # one shuffle, however many rules


def test_interval_overlap_join_matches_duckdb_on_events(spark, sf_dir, duck):
    """Overlap join on REAL event-derived intervals vs DuckDB's
    brute-force theta join — the at-scale-shape result equals the
    O(L x R) ground truth exactly."""
    got = sorted(
        (r.lid, r.rid)
        for r in joins.interval_overlap_join_binned(
            read_table(spark, sf_dir, "events")
            .where(F.col("event_id") < 300)
            .select(
                F.col("event_id").alias("lid"),
                (F.col("user_id") * 3).alias("llo"),
                (F.col("user_id") * 3 + F.col("event_id") % 7).alias("lhi"),
            ),
            read_table(spark, sf_dir, "events")
            .where((F.col("event_id") >= 300) & (F.col("event_id") < 600))
            .select(
                F.col("event_id").alias("rid"),
                (F.col("user_id") * 3 + 2).alias("rlo"),
                (F.col("user_id") * 3 + 2 + F.col("event_id") % 5).alias("rhi"),
            ),
            "llo", "lhi", "rlo", "rhi", 4,
        ).collect()
    )
    want = sorted(
        (r[0], r[1])
        for r in duck.execute("""
            WITH l AS (SELECT event_id AS lid, user_id*3 AS llo,
                              user_id*3 + event_id % 7 AS lhi
                       FROM events WHERE event_id < 300),
                 r AS (SELECT event_id AS rid, user_id*3 + 2 AS rlo,
                              user_id*3 + 2 + event_id % 5 AS rhi
                       FROM events WHERE event_id >= 300 AND event_id < 600)
            SELECT lid, rid FROM l, r
            WHERE llo <= rhi AND rlo <= lhi
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_er_to_golden_record_composition(spark):
    """The full MDM path: fuzzy pairs -> connected components ->
    survivorship — three planted patient spellings collapse to ONE
    golden record with the right field survivors."""
    from clinical_data_warehouse_bi_spark import graph

    recs = [
        # one real patient, three spellings, partial fields
        (1, "jon smith", "1990", None, "j@x.io"),
        (2, "john smith", "1990", "Boston", None),
        (3, "jhn smith", "1990", "Boston MA", None),
        # a distinct patient in the same block
        (4, "mary smith", "1990", "Salem", "m@x.io"),
        # and one in another block
        (5, "li wei", "1985", "Quincy", None),
    ]
    df = spark.createDataFrame(
        recs, "rec_id long, name string, birth_year string,"
        " city string, email string"
    )
    pairs = joins.fuzzy_blocked_pairs(
        df, "rec_id", "name", ["birth_year"], max_dist=2
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = graph.connected_components(
        edges, vertices=df.select(F.col("rec_id").alias("id"))
    )
    clustered = df.join(
        comp.select(F.col("id").alias("rec_id"), "component"), "rec_id"
    )
    golden = {
        r["component"]: r
        for r in joins.survivorship(
            clustered,
            "component",
            {"name": "first_non_null", "city": "longest",
             "email": "first_non_null"},
            order_col="rec_id",
        ).collect()
    }
    assert len(golden) == 3  # {1,2,3} merged; 4 and 5 alone
    merged = golden[1]
    assert merged["name"] == "jon smith"      # first record's spelling
    assert merged["city"] == "Boston MA"      # longest city string
    assert merged["email"] == "j@x.io"
    assert golden[4]["name"] == "mary smith"
    assert golden[5]["name"] == "li wei"


def test_remove_boilerplate_strips_furniture_only(spark):
    """A header planted in most docs of one source is stripped from
    that source; unique content and other sources are untouched;
    line order survives."""
    hdr = "SITE NAVIGATION home about contact"
    rows = [
        (i, "web", f"{hdr}\narticle body {i}\nunique line {i}")
        for i in range(8)
    ]
    rows.append((8, "web", "no header here\njust content 8"))
    rows.append((9, "books", f"{hdr}\nbook text 9"))  # small source: kept
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in T.remove_boilerplate(df, min_frac=0.5, min_docs=3).collect()
    }
    for i in range(8):
        assert out[i]["text"] == f"article body {i}\nunique line {i}", i
        assert out[i]["n_removed_lines"] == 1
    assert out[8]["text"] == "no header here\njust content 8"
    assert out[8]["n_removed_lines"] == 0
    # the 2-doc source is below min_docs: its header is content
    assert out[9]["text"] == f"{hdr}\nbook text 9"
    assert out[9]["n_removed_lines"] == 0
    # schema: original columns + the counter
    assert set(out[0].asDict()) == {"doc_id", "source", "text", "n_removed_lines"}


def test_remove_boilerplate_line_text_never_shuffles(spark, sf_dir):
    """The counting side shuffles only (source, md5, md5, doc) —
    line text reaches no keyed exchange."""
    from test_plans import _exchange_blocks

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    blocks = [
        b
        for b in _exchange_blocks(T.remove_boilerplate(docs))
        if "RoundRobinPartitioning" not in b and "Broadcast" not in b.splitlines()[0]
    ]
    assert blocks  # the slim counting aggregations
    for b in blocks:
        assert "text#" not in b, b
        assert "__lines#" not in b, b
        assert "__clean_lines#" not in b, b


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha\nbeta\nalpha\ngamma\nbeta"),
            (1, "one\ntwo\nthree"),
            (2, "same\nsame\nsame"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in T.dedup_lines(docs).collect()}
    assert got[0]["text"] == "alpha\nbeta\ngamma"
    assert got[0]["n_removed_lines"] == 2
    assert got[1]["text"] == "one\ntwo\nthree"
    assert got[1]["n_removed_lines"] == 0
    assert got[2]["text"] == "same" and got[2]["n_removed_lines"] == 2
    assert got[3]["text"] == "" and got[3]["n_removed_lines"] == 0
    # pure map: no exchange at all
    from test_plans import _exchange_blocks

    assert not _exchange_blocks(T.dedup_lines(docs))


def test_pivot_report_matches_duckdb_case_twin(spark, sf_dir, duck):
    """qa.pivot_report round-10 registration candidate: the DuckDB
    CASE-WHEN aggregation is the oracle shape; values match exactly
    (sums of decimal-backed doubles agree after the cast discipline)."""
    from clinical_data_warehouse_bi_spark import qa

    from clinical_data_warehouse_bi_spark.io import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("double").alias("qty"),
    )
    got = {
        r["l_returnflag"]: r
        for r in qa.pivot_report(
            li, ["l_returnflag"], "l_linestatus", ["F", "O"], {"qty": "sum"}
        ).collect()
    }
    want = {
        r[0]: r
        for r in duck.execute("""
            SELECT l_returnflag,
                   sum(CASE WHEN l_linestatus = 'F'
                            THEN CAST(l_quantity AS DOUBLE) END) AS f_sum,
                   sum(CASE WHEN l_linestatus = 'O'
                            THEN CAST(l_quantity AS DOUBLE) END) AS o_sum
            FROM lineitem GROUP BY l_returnflag
        """).fetchall()
    }
    assert set(got) == set(want)
    for k, g in got.items():
        for i, c in ((1, "F_sum_qty"), (2, "O_sum_qty")):
            a, b = want[k][i], g[c]
            assert (a is None and b is None) or abs(a - b) < 1e-6, (k, c, a, b)


def test_pivot_report_single_exchange_plan(spark, sf_dir):
    """Pivot must cost exactly the tall aggregate's one groupBy
    exchange — explicit values fold the pivot into the aggregate
    expressions, no distinct-discovery job, no second shuffle."""
    from clinical_data_warehouse_bi_spark import qa
    from test_plans import physical_plan

    from clinical_data_warehouse_bi_spark.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    plan = physical_plan(
        qa.pivot_report(
            li, ["l_returnflag"], "l_linestatus", ["F", "O"], {"l_quantity": "sum"}
        )
    )
    assert plan.count("Exchange") == 1, plan[:1200]


def test_pivot_unpivot_roundtrip_and_guards(spark):
    from clinical_data_warehouse_bi_spark import qa

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
        ["k", "p", "v"],
    )
    wide = qa.pivot_report(df, ["k"], "p", ["x", "y"], {"v": "sum"})
    assert set(wide.columns) == {"k", "x_sum_v", "y_sum_v"}
    tall = qa.unpivot_report(wide, ["k"], ["x_sum_v", "y_sum_v"])
    got = {(r["k"], r["metric"]): r["value"] for r in tall.collect()}
    assert got[("a", "x_sum_v")] == 1.0 and got[("a", "y_sum_v")] == 2.0
    assert got[("b", "x_sum_v")] == 3.0 and got[("b", "y_sum_v")] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        qa.pivot_report(df, ["k"], "p", [], {"v": "sum"})
    with _pytest.raises(ValueError):
        qa.pivot_report(df, ["k"], "p", ["x"], {"v": "median"})
    with _pytest.raises(ValueError):
        qa.unpivot_report(wide, ["k"], [])


def test_top_ngrams_matches_duckdb_and_never_shuffles_text(spark, sf_dir, duck):
    """text.top_ngrams (round-17 vectorized-Arrow rewrite): exact
    (ngram, n_occ, n_docs) agreement with DuckDB's direct
    string-grouped top-k, and the counting side ships only slim
    (h1, h2, cnt) partials — n-gram strings and raw text reach no
    count shuffle."""
    from clinical_data_warehouse_bi_spark import text as T2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["ngram"], r["n_occ"], r["n_docs"])
        for r in T2.top_ngrams(docs, n=3, k=50).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute("""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
              FROM documents),
            g AS (
              SELECT doc_id,
                     array_to_string(w[i:i+2], ' ') AS ngram
              FROM t, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i))
            SELECT ngram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
            FROM g GROUP BY ngram
            ORDER BY n_occ DESC, ngram ASC LIMIT 50
        """).fetchall()
    ]
    assert got == want
    # plan: the CORPUS-SIZED counting aggregation receives the Arrow
    # stage's per-task partials and exchanges only (h1, h2, cnt) —
    # never text or token arrays
    counts = (
        docs.select(F.col("text").alias("__text"))
        .mapInPandas(
            T2._ngram_count_partials(3), "h1 long, h2 long, cnt long"
        )
        .groupBy("h1", "h2")
        .agg(F.sum("cnt").alias("n_occ"))
    )
    cplan = counts._jdf.queryExecution().toString()
    cheads = [
        seg.split("\n", 1)[0]
        for seg in cplan.split("Exchange hashpartitioning")[1:]
    ]
    assert any(h.startswith("(h1#") for h in cheads), cheads
    assert not any("text#" in h or " w#" in h for h in cheads), cheads
    # the counting pass must never BUILD a window string either: no
    # concat_ws anywhere in the counting plan (strings exist only in
    # the recovery stage, and there only for candidate windows)
    assert "concat_ws" not in cplan, cplan[:1500]
    # recovery stage shape, asserted directly (the returned
    # top_ngrams relation is a collected LocalTableScan, so
    # asserting on it would be vacuous): candidate join is a
    # broadcast hash join; keyed exchanges carry only the bounded
    # ngram/h1 groupings; raw text enters no exchange — on BOTH the
    # candidate-filtered path and the tie-overflow fallback, and the
    # two paths recover identical relations
    cand = counts.limit(5)
    h1s = [r["h1"] for r in cand.select("h1").collect()]
    outs = []
    for pre in (h1s, None):
        rec = (
            docs.select(
                F.col("doc_id").alias("__id"), F.col("text").alias("__text")
            )
            .mapInPandas(
                T2._ngram_recovery(3, pre),
                "__id long, ngram string, h1 long, h2 long",
            )
            .join(F.broadcast(cand), ["h1", "h2"])
            .groupBy("ngram")
            .agg(
                F.first("n_occ").alias("n_occ"),
                F.count_distinct("__id").alias("n_docs"),
            )
        )
        rplan = rec._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in rplan, rplan[:1500]
        rheads = [
            seg.split("\n", 1)[0]
            for seg in rplan.split("Exchange hashpartitioning")[1:]
        ]
        assert rheads and all(
            h.startswith("(ngram#") or h.startswith("(h1#") for h in rheads
        ), rheads
        assert not any("text#" in h or " w#" in h for h in rheads), rheads
        outs.append(sorted(map(tuple, rec.collect())))
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_top_ngrams_edges(spark):
    from clinical_data_warehouse_bi_spark import text as T2

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert T2.top_ngrams(empty, n=3, k=5).count() == 0
    short = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert T2.top_ngrams(short, n=5, k=3).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T2.top_ngrams(short, n=0, k=3)


# ------------------------------------------------ benford_profile


def test_benford_matches_duckdb_on_lineitem(spark, sf_dir, duck):
    from clinical_data_warehouse_bi_spark import qa

    li = read_table(spark, sf_dir, "lineitem")
    got = sorted(
        (r["digit"], r["n"], round(r["observed_p"], 9))
        for r in qa.benford_profile(li, "l_extendedprice").collect()
    )
    want = sorted(
        (d, n, round(p, 9))
        for d, n, p in duck.execute("""
            WITH v AS (
              SELECT floor(abs(CAST(l_extendedprice AS DOUBLE))
                     / pow(10, floor(log10(abs(CAST(l_extendedprice AS DOUBLE))))))
                     ::INT AS digit
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL
                AND abs(CAST(l_extendedprice AS DOUBLE)) > 0)
            SELECT digit, count(*) AS n,
                   count(*) / sum(count(*)) OVER () AS p
            FROM v GROUP BY digit
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_benford_discriminates_natural_from_uniform(spark):
    from clinical_data_warehouse_bi_spark import qa

    import random

    rng = random.Random(17)
    natural = [(10 ** rng.uniform(0, 5),) for _ in range(20000)]
    uniform = [(float(rng.randint(1000, 9999)),) for _ in range(20000)]

    def mad(rows):
        df = spark.createDataFrame(rows, "v double")
        out = qa.benford_profile(df, "v").collect()
        return sum(r["abs_dev"] for r in out) / len(out)

    assert mad(natural) < 0.01        # log-uniform IS Benford
    assert mad(uniform) > 0.04        # flat digits are not


def test_benford_excludes_zero_null_and_uses_abs(spark):
    from clinical_data_warehouse_bi_spark import qa

    df = spark.createDataFrame(
        [(0.0,), (None,), (-314.0,), (0.0072,)], "v double"
    )
    rows = {r["digit"]: r["n"] for r in qa.benford_profile(df, "v").collect()}
    assert rows == {3: 1, 7: 1}


def test_benford_int_scale_exact_digits(spark):
    """The registered digit path (round-11 ADVICE fix): quantize to
    10^scale units, first char of the integer's EXACT decimal string
    — immune to libm log10 divergence at exact powers of 10 and to
    double->string rendering divergence. Exact powers of 10 must
    land on digit 1 (the log10 hazard case), sub-resolution values
    are excluded with the zeros, signs are ignored."""
    from clinical_data_warehouse_bi_spark import qa

    df = spark.createDataFrame(
        [(10.0,), (100.0,), (1000.0,), (0.01,), (0.001,), (-931.37,),
         (55.55,), (None,), (0.0,)],
        "v double",
    )
    rows = {r["digit"]: r["n"]
            for r in qa.benford_profile(df, "v", int_scale=2).collect()}
    # 10/100/1000/0.01 -> digit 1; 0.001 rounds to 0 units (excluded);
    # -931.37 -> 9; 55.55 -> 5
    assert rows == {1: 4, 9: 1, 5: 1}


# ------------------------------------ rolling_aggregate / attribution


def test_rolling_aggregate_matches_duckdb(spark, sf_dir, duck):
    from clinical_data_warehouse_bi_spark.timeseries import rolling_aggregate

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    got = sorted(
        (r["user_id"], str(r["ts"]), round(r["avg_7d"], 9), r["count_7d"],
         round(r["sum_7d"], 6))
        for r in rolling_aggregate(
            ev, ["user_id"], "ts", "value", 7, aggs=("avg", "sum", "count")
        ).collect()
    )
    want = sorted(
        (u, str(t), round(a, 9), c, round(s, 6))
        for u, t, a, c, s in duck.execute("""
            SELECT user_id, ts,
                   avg(value) OVER w AS avg_7d,
                   count(*)   OVER w AS count_7d,
                   sum(value) OVER w AS sum_7d
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 604799999999 PRECEDING
                               AND CURRENT ROW)
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_rolling_aggregate_single_exchange(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.timeseries import rolling_aggregate

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = rolling_aggregate(ev, ["user_id"], "ts", "value", 7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan  # sliding frame, never a self-join


def test_rolling_aggregate_rejects_bad_inputs(spark, sf_dir):
    import pytest

    from clinical_data_warehouse_bi_spark.timeseries import rolling_aggregate

    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        rolling_aggregate(ev, ["user_id"], "ts", "value", 0)
    with pytest.raises(ValueError):
        rolling_aggregate(ev, ["user_id"], "ts", "value", 7, aggs=("median",))


def _attribution_python(rows, model, lookback_days=None):
    """Independent per-user model: rows = (user, ts_epoch_us, channel,
    is_conv); same-instant touches sort before conversions.
    Timestamps are MICROSECOND epochs (the operator's precision)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, ch, conv in rows:
        by_user[u].append((t, 1 if conv else 0, ch))
    out = []
    for u, items in by_user.items():
        items.sort(key=lambda x: (x[0], x[1]))
        touches = []
        for t, conv, ch in items:
            if not conv:
                touches.append((t, ch))
                continue
            eligible = [p for p in touches if p[1] is not None]
            if lookback_days is not None:
                horizon = lookback_days * 86400 * 1_000_000
                eligible = [p for p in eligible if t - p[0] <= horizon]
            pick = None
            if eligible:
                # declared tiebreak: same-instant touches resolve by
                # channel — greatest for last_touch, least for first
                pick = (
                    max(eligible) if model == "last_touch" else min(eligible)
                )
            out.append((u, t, pick[1] if pick else None,
                        pick[0] if pick else None))
    return sorted(out)


def test_attribution_matches_python_model(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    rows = [
        (r["user_id"], int(round(r["ts"].timestamp() * 1_000_000)),
         r["event_type"], r["event_type"] == "purchase")
        for r in ev.collect()
    ]
    for model in ("last_touch", "first_touch"):
        got = sorted(
            (r["user"], int(round(r["conversion_ts"].timestamp() * 1_000_000)),
             r["credited_channel"],
             int(round(r["touch_ts"].timestamp() * 1_000_000))
             if r["touch_ts"] else None)
            for r in attribution(
                ev, "user_id", "ts", "event_type",
                F.col("event_type") == "purchase", model=model,
            ).collect()
        )
        want = _attribution_python(rows, model)
        assert got == want and len(got) > 0


def test_attribution_lookback_voids_stale_credit(spark):
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    rows = [
        (1, "2024-01-01 00:00:00", "ad", False),
        (1, "2024-03-01 00:00:00", "buy", True),   # 60d later: void
        (2, "2024-01-01 00:00:00", "ad", False),
        (2, "2024-01-05 00:00:00", "buy", True),   # in window
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_type string, conv boolean"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["user"]: r["credited_channel"]
        for r in attribution(
            df, "user_id", "ts", "event_type", F.col("conv"),
            lookback_days=30,
        ).collect()
    }
    assert out == {1: None, 2: "ad"}


def test_attribution_first_touch_lookback_is_window_filter(spark):
    """lookback + first_touch credits the EARLIEST touch inside the
    window, not the (stale) journey opener — the window-filter
    semantics the docstring pins."""
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    rows = [
        (1, "2024-01-01 00:00:00", "tv", False),    # opener, stale
        (1, "2024-02-20 00:00:00", "ad", False),    # in window
        (1, "2024-02-25 00:00:00", "email", False), # in window, later
        (1, "2024-03-01 00:00:00", "buy", True),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_type string, conv boolean"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = attribution(
        df, "user_id", "ts", "event_type", F.col("conv"),
        model="first_touch", lookback_days=30,
    ).collect()
    assert len(out) == 1 and out[0]["credited_channel"] == "ad"


def test_attribution_tiebreak_is_deterministic_by_channel(spark):
    """Declared round-11 tiebreak: same-instant touches resolve by
    channel order — greatest for last_touch, least for first_touch —
    and a NULL-channel touch is never creditable (it used to be able
    to split credited_channel and touch_ts across two rows)."""
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    rows = [
        (1, "2024-01-01 00:00:00", "ad", False),
        (1, "2024-01-01 00:00:00", "email", False),  # same instant
        (1, "2024-01-02 00:00:00", None, False),     # NULL channel
        (1, "2024-01-03 00:00:00", "buy", True),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_type string, conv boolean"
    ).withColumn("ts", F.to_timestamp("ts"))
    for model, want in (("last_touch", "email"), ("first_touch", "ad")):
        out = attribution(
            df, "user_id", "ts", "event_type", F.col("conv"), model=model
        ).collect()
        assert len(out) == 1
        assert out[0]["credited_channel"] == want, (model, out)
        # channel and ts from the SAME row: never the NULL-channel ts
        assert str(out[0]["touch_ts"]) == "2024-01-01 00:00:00"


def test_attribution_single_exchange(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    out = attribution(
        ev, "user_id", "ts", "event_type",
        F.col("event_type") == "purchase",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


# ----------------------------------------------- outlier_report


def test_outlier_report_matches_numpy(spark):
    import numpy as np

    from clinical_data_warehouse_bi_spark import qa

    rng = np.random.default_rng(5)
    clean = rng.normal(50, 5, 400)
    planted = np.array([500.0, -400.0, 51.0])
    vals = np.concatenate([clean, planted])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = {
        round(r["v"], 9): (r["modified_z"], r["is_outlier"])
        for r in qa.outlier_report(df, "v").collect()
    }
    med = float(np.median(vals))
    mad = float(np.median(np.abs(vals - med)))
    for v in vals:
        z_want = 0.6745 * (v - med) / mad
        z_got, flag = out[round(float(v), 9)]
        assert abs(z_got - z_want) < 1e-9
        assert flag == (abs(z_want) > 3.5)
    assert out[500.0][1] and out[-400.0][1] and not out[51.0][1]


def test_outlier_report_grouped_and_degenerate(spark):
    from clinical_data_warehouse_bi_spark import qa

    rows = (
        [("a", float(v)) for v in range(100)] + [("a", 10000.0)]
        # degenerate group: MAD 0 (all identical but one)
        + [("b", 7.0)] * 10 + [("b", 99.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = qa.outlier_report(df, "v", group_cols=["g"])
    a = {r["v"]: r["is_outlier"] for r in out.filter("g = 'a'").collect()}
    assert a[10000.0] is True and a[50.0] is False
    b = {r["v"]: (r["modified_z"], r["is_outlier"])
         for r in out.filter("g = 'b'").collect()}
    assert b[7.0] == (None, False)     # MAD 0: at the median
    assert b[99.0] == (None, True)     # MAD 0: differs from median


def test_outlier_report_null_group_key_kept(spark):
    """Rows with a NULL group-key value form their own group (as
    groupBy would) instead of being silently dropped by an equality
    join back — no row loss, and the NULL group gets its own
    median/MAD."""
    from clinical_data_warehouse_bi_spark import qa

    rows = (
        [(None, float(v)) for v in range(50)] + [(None, 9999.0)]
        + [("a", 5.0), ("a", 6.0), ("a", 7.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = qa.outlier_report(df, "v", group_cols=["g"])
    assert out.count() == len(rows)  # every input row survives
    nulls = {r["v"]: r["is_outlier"]
             for r in out.filter(F.col("g").isNull()).collect()}
    assert len(nulls) == 51
    assert nulls[9999.0] is True and nulls[25.0] is False


def test_outlier_oracle_join_keeps_null_groups():
    """Round-11 ADVICE: q_outlier_report's DuckDB oracle must use
    NULL-safe joins (IS NOT DISTINCT FROM) so a NULL group key forms
    its own group exactly like the Spark window partitioning — a
    plain USING join silently drops those rows and the oracle would
    disagree with the operator the moment the group column is
    nullable. Pinned here on synthetic data WITH a NULL key, since
    the fixture's l_shipdate happens to be NOT NULL."""
    import duckdb

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE t AS SELECT * FROM (VALUES
          (NULL, 1.0), (NULL, 2.0), (NULL, 3.0), (NULL, 100.0),
          ('a', 5.0), ('a', 6.0), ('a', 7.0)) AS v(g, x)
    """)
    rows = con.execute("""
        WITH med AS (
          SELECT g, median(x) AS med FROM t GROUP BY g),
        stats AS (
          SELECT b.g, any_value(m.med) AS med,
                 median(abs(b.x - m.med)) AS mad
          FROM t b JOIN med m ON b.g IS NOT DISTINCT FROM m.g
          GROUP BY b.g)
        SELECT b.g, b.x,
               CASE WHEN mad > 0
                    THEN abs(0.6745 * (x - med) / mad) > 3.5
                    ELSE x <> med END AS is_outlier
        FROM t b JOIN stats s ON b.g IS NOT DISTINCT FROM s.g
    """).fetchall()
    con.close()
    assert len(rows) == 7  # USING-join form would return only 3
    nulls = {x: o for g, x, o in rows if g is None}
    assert len(nulls) == 4
    assert nulls[100.0] is True and nulls[2.0] is False


# --------------------------------------------------- skew_report


def test_skew_report_exact_scalars(spark):
    from clinical_data_warehouse_bi_spark import qa

    rows = [("hot", i) for i in range(80)] + [
        (f"k{j}", j) for j in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, x int")
    rep = qa.skew_report(df, ["k"], top_n=3)
    assert rep["n_rows"] == 100 and rep["n_keys"] == 21
    assert rep["max_key_rows"] == 80
    assert abs(rep["max_key_share"] - 0.8) < 1e-12
    assert rep["top_keys"][0] == ("hot", 80)
    assert len(rep["top_keys"]) == 3
    # hot key is ~17x the mean (100/21): salting suggested
    import math

    assert rep["suggested_salt"] == min(256, math.ceil(80 / (100 / 21)))
    # HHI: (80^2 + 20*1)/100^2 = 0.642, exact
    assert abs(rep["hhi"] - 0.642) < 1e-12


def test_skew_report_uniform_keys_need_no_salt(spark, sf_dir):
    from clinical_data_warehouse_bi_spark import qa

    ev = read_table(spark, sf_dir, "events")
    rep = qa.skew_report(ev, ["user_id"])
    assert rep["suggested_salt"] <= 4  # organic per-user counts
    # zipf-ish organic activity: effective keys 1/hhi >> 1, no
    # single dominating user
    assert rep["hhi"] < 0.2 and rep["max_key_share"] < 0.2
    assert rep["n_rows"] == ev.count()
    import pytest

    with pytest.raises(ValueError):
        qa.skew_report(ev, [])


# ---------------------------------------------- seasonal_anomalies


def test_seasonal_anomalies_flags_broken_weekday_only(spark):
    from datetime import datetime, timedelta

    from clinical_data_warehouse_bi_spark.timeseries import seasonal_anomalies

    # 20 weeks of daily data: Mondays always 100, other days 10 —
    # a season-blind rule would flag every Monday; the weekday
    # baseline must flag ONLY the one broken Monday (value 500)
    base = datetime(2024, 1, 1)  # a Monday
    rows = []
    for d in range(140):
        ts = base + timedelta(days=d)
        v = 100.0 if ts.weekday() == 0 else 10.0
        if d == 105:  # a Monday (105 = 15 weeks exactly)
            v = 500.0
        rows.append(("k", ts.strftime("%Y-%m-%d %H:%M:%S"), v))
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = seasonal_anomalies(df, ["k"], "ts", "v", baseline_n=4).collect()
    flagged = [str(r["ts"]) for r in out if r["is_anomaly"]]
    assert flagged == ["2024-04-15 00:00:00"]  # day 105 only
    # normal Mondays score near zero residual against their slot
    normal_mondays = [
        r for r in out
        if r["baseline"] is not None and r["v"] == 100.0 and not r["is_anomaly"]
    ]
    assert normal_mondays and all(
        abs(r["residual"]) < 1e-9 for r in normal_mondays
    )


def test_seasonal_anomalies_cold_start_is_null(spark):
    from clinical_data_warehouse_bi_spark.timeseries import seasonal_anomalies

    rows = [("k", "2024-01-01 00:00:00", 5.0), ("k", "2024-01-02 00:00:00", 6.0)]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = seasonal_anomalies(df, ["k"], "ts", "v").collect()
    assert all(r["baseline"] is None and r["is_anomaly"] is None for r in out)
    import pytest

    with pytest.raises(ValueError):
        seasonal_anomalies(df, ["k"], "ts", "v", season="month")


# ----------------------------------------------- freshness_report


def test_freshness_report_matches_duckdb(spark, sf_dir, duck):
    from clinical_data_warehouse_bi_spark import qa

    ev = read_table(spark, sf_dir, "events")
    as_of = "2025-01-01 00:00:00"
    got = sorted(
        (r["event_type"], r["n_rows"], str(r["oldest"]), str(r["newest"]),
         round(r["lag_hours"], 6), r["rows_last_24h"])
        for r in qa.freshness_report(
            ev, "ts", as_of, source_col="event_type"
        ).collect()
    )
    want = sorted(
        (t, n, str(o), str(nw), round(lg, 6), rc)
        for t, n, o, nw, lg, rc in duck.execute(f"""
            SELECT event_type, count(*) AS n_rows,
                   min(ts) AS oldest, max(ts) AS newest,
                   date_diff('second', max(ts),
                             TIMESTAMP '{as_of}') / 3600.0 AS lag_hours,
                   count(*) FILTER (
                     WHERE ts >= TIMESTAMP '{as_of}' - INTERVAL 24 HOURS
                   ) AS recent
            FROM events GROUP BY 1
        """).fetchall()
    )
    assert got == want and len(got) == 5


def test_freshness_report_single_aggregation(spark, sf_dir):
    from clinical_data_warehouse_bi_spark import qa

    ev = read_table(spark, sf_dir, "events")
    out = qa.freshness_report(ev, "ts", "2025-01-01 00:00:00",
                              source_col="event_type")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    import pytest

    with pytest.raises(ValueError):
        qa.freshness_report(ev, "ts", "2025-01-01", recent_hours=0)


# --------------------------------------- chunk_text property sweep


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_chunk_texts = st.lists(
    st.text(alphabet="ab c\n\t", min_size=0, max_size=120),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(_chunk_texts, st.integers(2, 12), st.integers(0, 6))
def test_chunk_text_properties(spark, texts, chunk, overlap):
    from clinical_data_warehouse_bi_spark.text import chunk_text

    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_text(df, chunk, overlap).collect()
    stride = chunk - overlap
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert got == []
            continue
        # coverage: concatenating non-overlap prefixes rebuilds the doc
        rebuilt = []
        for j, r in enumerate(got):
            ch = r["chunk_text"].split()
            rebuilt.extend(ch if j == 0 else ch[overlap:])
            assert r["token_start"] == r["chunk_idx"] * stride
            assert r["token_end"] - r["token_start"] == len(ch)
        assert rebuilt == toks, (t, chunk, overlap)


# ---------------------------------------- split_assign / cluster_safe_split


def test_split_assign_matches_duckdb_and_covers(spark, sf_dir, duck):
    from clinical_data_warehouse_bi_spark import text as T2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = T2.split_assign(docs, fr, seed="s1")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    # exact cross-engine reproduction of the md5-uniform assignment
    want = dict(duck.execute("""
        SELECT doc_id,
               CASE WHEN u <= 0.8 THEN 'train'
                    WHEN u <= 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     (('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)),
                                      1, 8))::UBIGINT + 1.0)
                     / 4294967297.0 AS u
              FROM documents) t
    """).fetchall())
    assert got == want
    # disjoint cover with roughly the declared fractions
    n = len(got)
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"} and sum(c.values()) == n
    assert abs(c["train"] / n - 0.8) < 0.05
    # deterministic and seed-sensitive
    again = {r["doc_id"]: r["split"]
             for r in T2.split_assign(docs, fr, seed="s1").collect()}
    other = {r["doc_id"]: r["split"]
             for r in T2.split_assign(docs, fr, seed="s2").collect()}
    assert again == got and other != got
    # append stability: the assignment of an id is a pure function of
    # (seed, key) — a half-corpus run agrees with the full run
    half = {
        r["doc_id"]: r["split"]
        for r in T2.split_assign(
            docs.filter("doc_id % 2 = 0"), fr, seed="s1"
        ).collect()
    }
    assert all(got[i] == s for i, s in half.items())


def test_split_assign_is_shuffle_free_and_validates(spark, sf_dir):
    import pytest as _pt

    from clinical_data_warehouse_bi_spark import text as T2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = T2.split_assign(docs, {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row expression
    with _pt.raises(ValueError):
        T2.split_assign(docs, {"only": 1.0})
    with _pt.raises(ValueError):
        T2.split_assign(docs, {"a": 0.5, "b": 0.6})
    with _pt.raises(ValueError):
        T2.split_assign(docs, {"a": -0.5, "b": 1.5})


def test_cluster_safe_split_never_straddles(spark):
    """Near-dup cluster members always land in the SAME split;
    singletons get their own-id assignment (== plain split_assign)."""
    from clinical_data_warehouse_bi_spark import text as T2

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(400)], "doc_id long, text string"
    )
    # 100 clusters of 3 (ids 3k, 3k+1, 3k+2 share cluster 3k)
    clusters = spark.createDataFrame(
        [(3 * k + j, 3 * k) for k in range(100) for j in range(3)],
        "doc_id long, cluster_id long",
    )
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = T2.cluster_safe_split(docs, clusters, fr, seed="cs1")
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 400
    for k in range(100):
        assert rows[3 * k] == rows[3 * k + 1] == rows[3 * k + 2]
    # singletons (ids 300..399) match plain per-id assignment
    plain = {
        r["doc_id"]: r["split"]
        for r in T2.split_assign(
            docs.filter("doc_id >= 300").withColumn(
                "__skey", F.col("doc_id").cast("string")
            ),
            fr,
            seed="cs1",
            by_col="__skey",
        ).collect()
    }
    for i in range(300, 400):
        assert rows[i] == plain[i]


# -------------------------------------------- vocabulary_divergence


def test_vocabulary_divergence_matches_duckdb(spark, sf_dir, duck):
    """Per-token JS contributions against a DuckDB recomputation on
    the same two snapshots (documents split by doc_id parity);
    values compared to 1e-12, membership of the top set exact."""
    from clinical_data_warehouse_bi_spark import text as T2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    got = [
        (r["token"], r["p_a"], r["p_b"], r["js_contrib"])
        for r in T2.vocabulary_divergence(a, b, top_k=40).collect()
    ]
    want = duck.execute("""
        WITH ta AS (SELECT unnest(regexp_extract_all(lower(text),
                           '[a-z0-9]+')) AS token
                    FROM documents WHERE doc_id % 2 = 0),
        tb AS (SELECT unnest(regexp_extract_all(lower(text),
                           '[a-z0-9]+')) AS token
               FROM documents WHERE doc_id % 2 = 1),
        ca AS (SELECT token, count(*)::DOUBLE AS n_a FROM ta GROUP BY 1),
        cb AS (SELECT token, count(*)::DOUBLE AS n_b FROM tb GROUP BY 1),
        j AS (SELECT coalesce(ca.token, cb.token) AS token,
                     coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
              FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        tots AS (SELECT (SELECT sum(n_a) FROM ca) AS sa,
                        (SELECT sum(n_b) FROM cb) AS sb),
        terms AS (
          SELECT token, n_a / sa AS p_a, n_b / sb AS p_b,
                 (CASE WHEN n_a > 0 THEN (n_a/sa) * log2((n_a/sa) /
                        ((n_a/sa + n_b/sb) / 2.0)) ELSE 0 END
                + CASE WHEN n_b > 0 THEN (n_b/sb) * log2((n_b/sb) /
                        ((n_a/sa + n_b/sb) / 2.0)) ELSE 0 END) / 2.0
                   AS js_contrib
          FROM j, tots)
        SELECT token, p_a, p_b, js_contrib FROM terms
        ORDER BY js_contrib DESC, token ASC LIMIT 40
    """).fetchall()
    # the sf0.001 vocabulary is smaller than top_k: both engines
    # return the full vocabulary, which must agree exactly
    assert len(got) == len(want) > 20
    assert {t for t, *_ in got} == {t for t, *_ in want}
    gm = {t: (pa, pb, js) for t, pa, pb, js in got}
    for t, pa, pb, js in want:
        ga, gb, gj = gm[t]
        assert abs(ga - pa) < 1e-12 and abs(gb - pb) < 1e-12
        assert abs(gj - js) < 1e-12


def test_vocabulary_divergence_properties(spark):
    """Identical corpora diverge by zero everywhere; a token present
    on one side only carries the maximal per-token share; full-vocab
    js_contrib sums into [0, 1]."""
    from clinical_data_warehouse_bi_spark import text as T2

    a = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    same = T2.vocabulary_divergence(a, a, top_k=100).collect()
    assert all(abs(r["js_contrib"]) < 1e-15 for r in same)
    b = spark.createDataFrame(
        [(3, "alpha beta delta")], "doc_id long, text string"
    )
    out = T2.vocabulary_divergence(a, b, top_k=100).collect()
    total = sum(r["js_contrib"] for r in out)
    assert 0.0 < total <= 1.0 + 1e-12
    top = out[0]
    assert top["token"] in ("gamma", "delta")  # one-sided tokens lead
    import pytest as _pt

    with _pt.raises(ValueError):
        T2.vocabulary_divergence(a, b, top_k=0)


def test_outlier_report_oracle_shaped_duckdb_parity(spark, sf_dir, duck):
    """Registration-ready oracle for the q_outlier_report candidate:
    grouped modified-z over lineitem quantities vs a DuckDB
    recomputation, values quantized decimal(28,9)->string on both
    sides (the cross-engine float convention)."""
    from clinical_data_warehouse_bi_spark import qa
    from clinical_data_warehouse_bi_spark.io import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    out = qa.outlier_report(li, "l_extendedprice", ["l_returnflag"])
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"],
         r["modified_z"], bool(r["is_outlier"]))
        for r in out.select(
            "l_orderkey", "l_linenumber",
            F.col("modified_z").cast("decimal(28,9)").cast("string")
            .alias("modified_z"),
            "is_outlier",
        ).collect()
    )
    want = sorted(
        (a, b, z, bool(f))
        for a, b, z, f in duck.execute("""
            WITH med AS (
              SELECT l_returnflag, median(l_extendedprice) AS med
              FROM lineitem GROUP BY l_returnflag),
            stats AS (
              SELECT l.l_returnflag, any_value(m.med) AS med,
                     median(abs(l.l_extendedprice - m.med)) AS mad
              FROM lineitem l JOIN med m USING (l_returnflag)
              GROUP BY l.l_returnflag)
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(CASE WHEN mad > 0 THEN
                        0.6745 * (l_extendedprice - med) / mad END
                        AS DECIMAL(28,9)) AS VARCHAR) AS modified_z,
                   CASE WHEN mad > 0
                        THEN abs(0.6745 * (l_extendedprice - med) / mad)
                             > 3.5
                        ELSE l_extendedprice <> med END AS is_outlier
            FROM lineitem JOIN stats USING (l_returnflag)
        """).fetchall()
    )
    assert len(got) == len(want) > 1000
    assert got == want


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)),
        min_size=0,
        max_size=30,
    ),
    seed=st.sampled_from(["h1", "h2"]),
)
@pytest.mark.slow
def test_cluster_safe_split_property(spark, edges, seed):
    """Random near-dup pair sets: composing connected_components with
    cluster_safe_split never lets two connected documents straddle a
    split, every document is assigned exactly once, and the
    assignment is deterministic per seed."""
    from clinical_data_warehouse_bi_spark import text as T2
    from clinical_data_warehouse_bi_spark.graph import connected_components

    n = 40
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(n)], "doc_id long, text string"
    )
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    if edges:
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        clusters = comp.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
        )
    else:
        clusters = spark.createDataFrame([], "doc_id long, cluster_id long")
    out = {
        r["doc_id"]: r["split"]
        for r in T2.cluster_safe_split(
            docs, clusters, fr, seed=seed
        ).collect()
    }
    assert len(out) == n  # exactly one assignment per doc
    # union-find ground truth for connectivity
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    for a, b in edges:
        assert out[a] == out[b], (a, b, out[a], out[b])
    again = {
        r["doc_id"]: r["split"]
        for r in T2.cluster_safe_split(
            docs, clusters, fr, seed=seed
        ).collect()
    }
    assert again == out


def test_attribution_both_equals_union_of_models(spark, sf_dir):
    """model=\"both\" (one window pass + stack) returns exactly the
    union of the two single-model outputs, row for row."""
    from clinical_data_warehouse_bi_spark.timeseries import attribution

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    pred = F.col("event_type") == "purchase"
    both = sorted(
        (r["model"], r["user"], str(r["conversion_ts"]),
         r["credited_channel"], str(r["touch_ts"]))
        for r in attribution(
            ev, "user_id", "ts", "event_type", pred,
            model="both", lookback_days=30,
        ).collect()
    )
    want = sorted(
        (m, r["user"], str(r["conversion_ts"]),
         r["credited_channel"], str(r["touch_ts"]))
        for m in ("last_touch", "first_touch")
        for r in attribution(
            ev, "user_id", "ts", "event_type", pred,
            model=m, lookback_days=30,
        ).collect()
    )
    assert both == want and len(both) > 0


def test_tfidf_keywords_hand_computed(spark):
    """text.tfidf_keywords on a corpus small enough to check by hand:
    N = 4 docs (doc 4 tokenizes empty but still counts toward N);
    'rare' appears 2x in doc 1 only (tf=2, df=1 ->
    score = 2*ln((N+1)/2)); 'the' appears in docs 1-3 (df=3 -> idf =
    ln(5/4), small but positive, so it still ranks where it is the
    only term); ties on score break term-ASC. Also pins the k bound
    and the empty-token doc (no rows)."""
    import math

    from clinical_data_warehouse_bi_spark.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "rare rare the beta"),
            (2, "the beta gamma"),
            (3, "the ... !!"),  # tokens: ['the'] only
            (4, "???"),  # no tokens at all -> no output rows
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r["doc_id"], r["rnk"]): r
        for r in tfidf_keywords(docs, k=2).collect()
    }
    n = 4.0
    # doc 1: rare (tf=2, df=1) beats beta (tf=1, df=2) beats the
    r = out[(1, 1)]
    assert r["term"] == "rare" and r["tf"] == 2 and r["df"] == 1
    assert r["score"] == round(2 * math.log((n + 1) / 2), 4)
    assert out[(1, 2)]["term"] == "beta"
    # doc 2: beta and gamma tie on tf=1 only if df equal — gamma df=1
    # (rarer) so gamma first, then beta (df=2)
    assert out[(2, 1)]["term"] == "gamma"
    assert out[(2, 2)]["term"] == "beta"
    # doc 3: only 'the' (df=3): idf = ln(5/4) > 0 still ranks
    assert out[(3, 1)]["term"] == "the"
    assert (3, 2) not in out  # k bound respects vocab size
    # doc 4 emits nothing
    assert not any(d == 4 for d, _ in out)
    # exactly k rows max per doc
    assert max(rnk for _, rnk in out) <= 2


def test_tfidf_keywords_plan_shape(spark, sf_dir):
    """The staged q_tfidf_keywords plan: no raw-text column in any
    exchange (only the bounded term/token vocabulary columns ride
    shuffles), the idf side arrives broadcast, and no cartesian
    product beyond the two 1-row/vocab-row broadcast crossJoins."""
    from clinical_data_warehouse_bi_spark.queries.text_ops import (
        q_tfidf_keywords,
    )

    plan = q_tfidf_keywords(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_snapshot_diff_classification_and_null_keys(spark):
    """qa.snapshot_diff on a hand-built pair: added/removed/changed
    classified correctly, unchanged rows filtered, and a NULL key is
    a REAL row on both sides (presence markers, not key-nullness,
    decide side absence — the null-safe-join convention)."""
    from clinical_data_warehouse_bi_spark.qa import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a"),  # unchanged
            (2, "b"),  # changed
            (3, "c"),  # removed
            (None, "n1"),  # NULL key, changed
        ],
        "k int, fp string",
    )
    new = spark.createDataFrame(
        [
            (1, "a"),
            (2, "B"),
            (4, "d"),  # added
            (None, "n2"),
        ],
        "k int, fp string",
    )
    got = {
        (r["k"], r["change"]): (r["fp_old"], r["fp_new"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        (2, "changed"): ("b", "B"),
        (3, "removed"): ("c", None),
        (4, "added"): (None, "d"),
        (None, "changed"): ("n1", "n2"),
    }


def test_snapshot_diff_rejects_empty_keys_and_handles_null_fp(spark):
    import pytest as _pytest

    from clinical_data_warehouse_bi_spark.qa import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "k int, fp string")
    with _pytest.raises(ValueError):
        snapshot_diff(df, df, [])
    # NULL fingerprints on PRESENT sides: null-safe compare — both
    # NULL is unchanged (filtered), NULL vs value is changed
    old = spark.createDataFrame([(1, None), (2, None)], "k int, fp string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k int, fp string")
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed"}


def test_snapshot_diff_check_unique_probe(spark):
    """check_unique=True fails loudly on duplicate keys (the silent
    full-outer fan-out mode the round-12 advice flagged) and passes
    through unchanged on unique keys — including NULL keys, which
    are one real group under the null-safe join, so two NULL-key
    rows on one side count as duplicates."""
    import pytest as _pytest

    from clinical_data_warehouse_bi_spark.qa import snapshot_diff

    uniq = spark.createDataFrame([(1, "a"), (2, "b")], "k int, fp string")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, fp string")
    # unique sides: probe passes, diff unchanged
    assert snapshot_diff(uniq, uniq, ["k"], check_unique=True).count() == 0
    for bad_old, bad_new in ((dup, uniq), (uniq, dup)):
        with _pytest.raises(ValueError, match="not unique"):
            snapshot_diff(bad_old, bad_new, ["k"], check_unique=True)
    nulldup = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k int, fp string"
    )
    with _pytest.raises(ValueError, match="not unique"):
        snapshot_diff(nulldup, uniq, ["k"], check_unique=True)


def test_snapshot_diff_probe_on_by_default(spark, tmp_path, monkeypatch):
    """Round-13 verdict item 9: at DEFAULT settings a duplicate-keyed
    snapshot fails loudly (auto probe), the footer row-budget gate
    skips the probe for sides past SNAPSHOT_UNIQUE_PROBE_MAX_ROWS,
    and check_unique=False opts out entirely."""
    import pytest as _pytest

    from clinical_data_warehouse_bi_spark import qa
    from clinical_data_warehouse_bi_spark.qa import snapshot_diff

    uniq = spark.createDataFrame([(1, "a"), (2, "b")], "k int, fp string")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, fp string")
    # in-memory (driver-bounded) inputs: the default probes and raises
    with _pytest.raises(ValueError, match="not unique"):
        snapshot_diff(dup, uniq, ["k"])
    # explicit opt-out: the fan-out mode, silently (documented)
    assert snapshot_diff(dup, uniq, ["k"], check_unique=False).count() > 0
    # parquet-backed inputs under the budget: probed, raises
    p_dup, p_uniq = str(tmp_path / "dup"), str(tmp_path / "uniq")
    dup.write.parquet(p_dup)
    uniq.write.parquet(p_uniq)
    r_dup, r_uniq = spark.read.parquet(p_dup), spark.read.parquet(p_uniq)
    with _pytest.raises(ValueError, match="not unique"):
        snapshot_diff(r_dup, r_uniq, ["k"])
    # past the budget: the gate skips the probe (diff fans out, no
    # raise) — and forcing check_unique=True overrides the gate
    monkeypatch.setattr(qa, "SNAPSHOT_UNIQUE_PROBE_MAX_ROWS", 0)
    assert snapshot_diff(r_dup, r_uniq, ["k"]).count() > 0
    with _pytest.raises(ValueError, match="not unique"):
        snapshot_diff(r_dup, r_uniq, ["k"], check_unique=True)


def test_footer_rows_void_for_row_multiplying_plans(spark, tmp_path):
    """The footer-sum upper bound holds only for scan/filter/project
    shapes: a join- or explode-bearing side can emit far more rows
    than its input files hold, so _footer_rows must return None for
    it (auto probe gate falls back to 'not provably bounded' — probe
    skipped unless forced), while plain scans and filtered scans
    still read their footers (round-14 advice item 3)."""
    from clinical_data_warehouse_bi_spark import qa

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, "x") for i in range(10)], "k int, fp string"
    ).write.parquet(p)
    scan = spark.read.parquet(p)
    assert qa._footer_rows(scan) == 10
    assert qa._footer_rows(scan.where("k > 3").select("k")) == 10
    # join: output can exceed both inputs' footers
    assert qa._footer_rows(scan.join(scan.select("k"), "k")) is None
    # explode: one row fans out arbitrarily
    exploded = scan.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v")
    )
    assert qa._footer_rows(exploded) is None
    # round-16 advice: Expand (rollup/cube) replicates each input row
    # per grouping set, and MapInArrow/EvalPython run arbitrary-arity
    # Python — both void the footer bound too
    rolled = scan.rollup("k", "fp").count()
    assert qa._footer_rows(rolled) is None

    def _fan(it):
        yield from it

    arrowed = scan.mapInArrow(_fan, "k int, fp string")
    assert qa._footer_rows(arrowed) is None
    # and the auto gate therefore does NOT launch the probe on a
    # duplicate-keyed join-shaped side (no raise — not provably
    # bounded), while check_unique=True still forces it
    dup_join = scan.unionByName(scan).join(
        spark.range(1).selectExpr("0 as j"), F.lit(True), "left"
    ).select("k", "fp")
    uniq = spark.createDataFrame([(1, "a")], "k int, fp string")
    assert qa.snapshot_diff(dup_join, uniq, ["k"]).count() > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not unique"):
        qa.snapshot_diff(dup_join, uniq, ["k"], check_unique=True)


def test_snapshot_diff_plan_is_slim(spark, sf_dir):
    """q_snapshot_diff's exchanges carry only (key, fingerprint,
    presence) — no payload column (status/price/date/priority) ever
    shuffles; the join is the one full-outer SMJ (both sides must
    survive, broadcast impossible)."""
    from clinical_data_warehouse_bi_spark.queries.qa_report import (
        q_snapshot_diff,
    )

    plan = q_snapshot_diff(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            for payload in ("o_orderstatus", "o_totalprice", "o_orderdate",
                            "o_orderpriority", "o_custkey"):
                assert payload not in line, line


def test_interval_pick_first_mapside_matches_window_form(spark):
    """joins.interval_pick_first_mapside == the classic equi-join +
    window pick-first on a fixture with every edge the operator
    handles: multi-match ties (identical payload), NULL lo/hi rows
    (can never match), NULL join keys on the left (no match, payload
    NULL), NULL payload among survivors (null-last ordering), and
    no-match rows. Both the broadcast path and (via a zero budget)
    the shuffle fallback are exercised."""
    from pyspark.sql import functions as F

    from clinical_data_warehouse_bi_spark.joins import (
        interval_join_pick_first,
        interval_pick_first_mapside,
    )

    left = spark.createDataFrame(
        [
            (1, 10, 5),    # two matching intervals -> earliest lo wins
            (1, 10, 25),   # matches only the second interval
            (2, 20, 5),    # right rows exist but none covers ts
            (3, 30, 5),    # no right rows at all
            (None, 10, 5), # NULL key: never matches
            (4, 40, 5),    # NULL-payload vs payload tie on lo
        ],
        "k bigint, sub bigint, ts bigint",
    )
    right = spark.createDataFrame(
        [
            (1, 10, 0, 9, "a"),
            (1, 10, 3, 9, "b"),    # same coverage, later lo
            (1, 10, 20, 30, "c"),
            (2, 20, 50, 60, "d"),
            (2, 20, None, 9, "x"), # NULL lo can never match
            (4, 40, 0, 9, None),   # NULL payload sorts after 'e'
            (4, 40, 0, 9, "e"),
        ],
        "rk bigint, rsub bigint, lo bigint, hi bigint, pay string",
    )

    def normalize(df):
        rows = [
            (r["k"], r["sub"], r["ts"], r["pay"])
            for r in df.select("k", "sub", "ts", "pay").collect()
        ]
        return sorted(
            rows,
            key=lambda t: tuple(
                (v is not None, v) for v in t
            ),
        )

    window_form = interval_join_pick_first(
        left,
        right,
        equi=(F.col("k") == F.col("rk")) & (F.col("sub") == F.col("rsub")),
        ts_col=F.col("ts"),
        lo_col=F.col("lo"),
        hi_col=F.col("hi"),
        left_key=["k", "sub", "ts"],
        order=[F.col("lo").asc_nulls_last(), F.col("pay").asc_nulls_last()],
    )
    expected = normalize(window_form)
    assert expected == [
        (None, 10, 5, None),
        (1, 10, 5, "a"),
        (1, 10, 25, "c"),
        (2, 20, 5, None),
        (3, 30, 5, None),
        (4, 40, 5, "e"),
    ]
    for budget in (2_000_000, 0):  # broadcast path, then fallback
        got = interval_pick_first_mapside(
            left,
            right,
            on=[("k", "rk"), ("sub", "rsub")],
            ts_col=F.col("ts"),
            lo="lo",
            hi="hi",
            order_cols=["lo", "pay"],
            payload=["pay"],
            left_row_key=["k", "sub", "ts"],
            max_broadcast_rows=budget,
        )
        assert normalize(got) == expected, budget


def test_mapside_interval_pin_registry_bounded(spark):
    """Round-14 advice item 4: the broadcast path's persisted packed
    relation is handed to a bounded FIFO registry — many calls in one
    session leave at most _PINNED_PACKED_MAX relations cached (the
    evicted ones are unpersisted), instead of pinning one per call
    until a session-wide clearCache."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from clinical_data_warehouse_bi_spark import joins

    joins._PINNED_PACKED.clear()
    ev0 = joins.PINNED_PACKED_EVICTIONS
    left = spark.createDataFrame([(1, 5)], "k bigint, ts bigint")
    evicted = []
    for i in range(joins._PINNED_PACKED_MAX + 3):
        right = spark.createDataFrame(
            [(1, 0, 9, f"p{i}")], "rk bigint, lo bigint, hi bigint, pay string"
        )
        got = joins.interval_pick_first_mapside(
            left, right,
            on=[("k", "rk")], ts_col=F.col("ts"), lo="lo", hi="hi",
            order_cols=["lo"], payload=["pay"], left_row_key=["k", "ts"],
        )
        assert got.collect()[0]["pay"] == f"p{i}"
        if len(joins._PINNED_PACKED) == joins._PINNED_PACKED_MAX:
            evicted = [joins._PINNED_PACKED[0]]
    assert len(joins._PINNED_PACKED) == joins._PINNED_PACKED_MAX
    # an evicted relation is no longer cached
    for df in evicted:
        if df not in joins._PINNED_PACKED:
            assert df.storageLevel == StorageLevel.NONE
    # round-16 advice: evictions are counted (observability for
    # workloads whose concurrency outruns the cap)
    assert joins.PINNED_PACKED_EVICTIONS - ev0 == 3
    # and the cap is resizable at runtime
    joins.set_pinned_packed_max(joins._PINNED_PACKED_MAX + 2)
    try:
        assert joins._PINNED_PACKED_MAX == 6
    finally:
        joins.set_pinned_packed_max(4)


@pytest.mark.slow
def test_epoch_shuffle_properties(spark):
    """epoch_shuffle: positions are a dense 1..N bijection; the
    permutation is layout-independent (same output from a 1-partition
    and a 13-partition input — the promise orderBy(rand()) cannot
    make); different seeds produce different permutations; and the
    order is exactly seeded-md5 order (the oracle semantics)."""
    import hashlib

    from clinical_data_warehouse_bi_spark.text import epoch_shuffle

    ids = list(range(200))
    df1 = spark.createDataFrame([(i,) for i in ids], "doc_id long").coalesce(1)
    df13 = spark.createDataFrame([(i,) for i in ids], "doc_id long").repartition(13)
    out1 = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(df1, seed=7).collect()
    }
    out13 = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(df13, seed=7, n_ranges=5).collect()
    }
    assert sorted(out1.values()) == list(range(1, 201))  # dense bijection
    assert out1 == out13  # layout-independent
    expected = {
        d: pos + 1
        for pos, d in enumerate(
            sorted(ids, key=lambda d: (hashlib.md5(f"7:{d}".encode()).hexdigest(), d))
        )
    }
    assert out1 == expected  # exactly seeded-md5 order
    out_seed9 = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(df1, seed=9).collect()
    }
    assert out_seed9 != out1  # a different epoch is a different permutation
    assert sorted(out_seed9.values()) == list(range(1, 201))


def test_repeat_upsample_properties(spark):
    """repeat_upsample: realized copy count per row equals the
    python-computed md5 reference exactly (floor(f) + Bernoulli on
    the portable uniform), copy_idx is dense 1..n per surviving row,
    factor-0 sources vanish, unmapped sources pass through once, and
    negative factors are rejected."""
    import hashlib

    import pytest as _pytest

    from clinical_data_warehouse_bi_spark.text import repeat_upsample

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    factors = {"a": 2.5, "b": 0.5, "c": 0.0}
    got = {}
    for r in repeat_upsample(df, factors, seed="t1").collect():
        got.setdefault((r["doc_id"], r["source"]), []).append(r["copy_idx"])

    def uniform(seed, d):
        h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8]
        return (int(h, 16) + 1.0) / 4294967297.0

    import math

    for d, s in rows:
        f = factors.get(s, 1.0)
        n = int(math.floor(f)) + (1 if uniform("t1", d) < f - math.floor(f) else 0)
        copies = sorted(got.get((d, s), []))
        assert copies == list(range(1, n + 1)), (d, s, f, n, copies)
    # factor-0 source fully vanished; unmapped passes through once
    assert not any(s == "c" for _, s in got)
    assert all(got[(d, "d")] == [1] for d, s in rows if s == "d")
    with _pytest.raises(ValueError, match=">= 0"):
        repeat_upsample(df, {"a": -1.0})
