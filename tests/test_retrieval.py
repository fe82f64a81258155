"""BM25 retrieval (retrieval.py) and the declarative expectation
suite (qa.expectation_report): semantics, batch==single equivalence,
and the plan shapes that carry them to 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import qa, retrieval
from clinical_data_warehouse_bi_spark.io import load_tables
from test_plans import physical_plan


# ---------------------------------------------------------------- BM25

def test_bm25_batch_matches_single(spark, sf_dir):
    """The many-query posting-list path must agree with the
    shuffle-free single-query path: same matching-doc set, same
    scores (to rounding) for every query. k exceeds the corpus so
    rank-boundary ulp noise cannot perturb the compared sets."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    queries = spark.createDataFrame(
        [(1, "hash join"), (2, "spark merge sort"), (3, "vector")],
        ["query_id", "q_text"],
    )
    batch = retrieval.bm25_batch_topk(docs, queries, k=100_000).collect()
    by_query: dict[int, dict[int, float]] = {}
    for r in batch:
        by_query.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]

    for qid, terms in [(1, ["hash", "join"]), (2, ["spark", "merge", "sort"]), (3, ["vector"])]:
        single = {
            r["doc_id"]: r["score"]
            for r in retrieval.bm25_topk(docs, terms, k=100_000).collect()
        }
        got = by_query[qid]
        assert set(got) == set(single)
        for d, s in single.items():
            assert abs(got[d] - s) < 1e-3, (qid, d, got[d], s)


def test_bm25_single_query_never_shuffles_docs(spark, sf_dir):
    """Scale contract: per-term tf is a per-row array expression —
    no explode, no hash-partition exchange of document rows; the
    top-k is a TakeOrderedAndProject."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    plan = physical_plan(retrieval.bm25_topk(docs, ["hash", "join"], 10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Generate explode" not in plan


def test_bm25_idf_favors_rare_terms(spark):
    """A doc matching only the rare term must outscore a doc
    matching only the ubiquitous term (equal tf and length)."""
    rows = [(0, "rare alpha beta gamma"), (1, "common alpha beta gamma")]
    rows += [(i, "common filler one two") for i in range(2, 22)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(docs, ["rare", "common"], 50).collect()
    }
    assert got[0] > got[1]


def test_bm25_tf_saturates(spark):
    """More occurrences score higher, but sub-linearly (k1 cap)."""
    docs = spark.createDataFrame(
        [
            (0, "hash miss miss miss"),
            (1, "hash hash miss miss"),
            (2, "hash hash hash hash"),
            (3, "miss miss miss miss"),
        ],
        ["doc_id", "text"],
    )
    res = retrieval.bm25_topk(docs, ["hash"], 10).collect()
    got = {r["doc_id"]: r["score"] for r in res}
    assert 3 not in got  # zero matches filtered out
    assert got[2] > got[1] > got[0]
    # saturation: tf 1->2 gains more than tf 2->4
    assert (got[1] - got[0]) > (got[2] - got[1])


def test_bm25_rejects_bad_terms(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, [], 10)
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, ["Hash Join"], 10)


# ----------------------------------------------- expectation suite

def test_expectation_report_planted_violations(spark):
    """Every check kind against tables with KNOWN defect counts."""
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (2, 11, "F", -3.0),   # range violation (totalprice < 0)
            (3, None, "X", 7.0),  # null FK + bad status
            (3, 12, "O", 2.0),    # duplicate key; custkey 12 orphan
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )
    customer = spark.createDataFrame([(10,), (11,)], ["c_custkey"])
    spec = [
        {"check": "not_null", "table": "orders", "column": "o_custkey"},
        {"check": "accepted_range", "table": "orders",
         "column": "o_totalprice", "lo": 0.0, "hi": None},
        {"check": "accepted_values", "table": "orders",
         "column": "o_orderstatus", "values": ["O", "F"]},
        {"check": "unique", "table": "orders", "columns": ["o_orderkey"]},
        {"check": "referential", "table": "orders", "column": "o_custkey",
         "ref_table": "customer", "ref_column": "c_custkey"},
        {"check": "cross_sum", "name": "orders_vs_customers",
         "table": "orders", "expr": "count(distinct o_custkey)",
         "other_table": "customer", "other_expr": "count(*)"},
    ]
    rep = {
        r["check_name"]: (r["violations"], r["total_rows"], r["passed"])
        for r in qa.expectation_report(
            {"orders": orders, "customer": customer}, spec
        ).collect()
    }
    assert rep["not_null:orders.o_custkey"] == (1, 4, False)
    assert rep["accepted_range:orders.o_totalprice"] == (1, 4, False)
    assert rep["accepted_values:orders.o_orderstatus"] == (1, 4, False)
    assert rep["unique:orders.o_orderkey"] == (1, 4, False)
    # null FK passes referential; custkey 12 has no match
    assert rep["referential:orders.o_custkey->customer.c_custkey"] == (1, 4, False)
    # 3 distinct custkeys vs 2 customers
    assert rep["cross_sum:orders_vs_customers"] == (1, 3, False)
    assert len(rep) == len(spec)


def test_expectation_row_checks_fuse_into_one_scan(spark, sf_dir):
    """N row-expression checks on one table must compile to ONE
    aggregation pass (one scan), not N jobs."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    spec = [
        {"check": "not_null", "table": "lineitem", "column": "l_quantity"},
        {"check": "accepted_range", "table": "lineitem",
         "column": "l_quantity", "lo": 1.0, "hi": 50.0},
        {"check": "accepted_range", "table": "lineitem",
         "column": "l_discount", "lo": 0.0, "hi": 0.1},
        {"check": "accepted_values", "table": "lineitem",
         "column": "l_returnflag", "values": ["A", "N", "R"]},
    ]
    plan = physical_plan(qa.expectation_report(t, spec))
    assert plan.count("Scan parquet") == 1


def test_expectation_compiler_fallback_paths(spark):
    """The round-10 wide-row compiler's non-rebased paths: a
    cross_sum whose expression is NOT count(*)/count(DISTINCT key)
    (raw scalar branch), a second unique on the same table (its own
    scalar branch), and a referential check on a table with NO
    unique base (raw anti + its own count(*) total)."""
    a = spark.createDataFrame(
        [(1, 10, 2.0), (2, 10, 3.0), (3, 11, 5.0), (3, 11, 5.0)],
        ["id", "fk", "v"],
    )
    b = spark.createDataFrame([(10, 5.0)], ["k", "w"])
    spec = [
        {"check": "unique", "table": "a", "columns": ["id"]},
        {"check": "unique", "table": "a", "columns": ["id", "fk"]},
        # sum() sides: neither is rebasable onto the unique base
        {"check": "cross_sum", "name": "sums",
         "table": "a", "expr": "sum(v)",
         "other_table": "b", "other_expr": "sum(w) * 3"},
        # b has no unique/flags: raw anti-join + raw count(*) total
        {"check": "referential", "table": "b", "column": "k",
         "ref_table": "a", "ref_column": "fk"},
        # a HAS a base but fk is its key only in the second unique:
        # count(*) side still rides the base total
        {"check": "cross_sum", "name": "rows_vs_rows",
         "table": "a", "expr": "count(*)",
         "other_table": "b", "other_expr": "count(*)"},
    ]
    rep = {
        r["check_name"]: (r["violations"], r["total_rows"], r["passed"])
        for r in qa.expectation_report({"a": a, "b": b}, spec).collect()
    }
    assert rep["unique:a.id"] == (1, 4, False)       # id 3 duplicated
    assert rep["unique:a.id+fk"] == (1, 4, False)    # (3,11) duplicated
    # sum(v)=15, sum(w)*3=15 -> equal
    assert rep["cross_sum:sums"] == (0, 15, True)
    # b.k=10 matches a.fk -> no orphans, total over b
    assert rep["referential:b.k->a.fk"] == (0, 1, True)
    assert rep["cross_sum:rows_vs_rows"] == (3, 4, False)  # 4 vs 1
    assert len(rep) == len(spec)


def test_expectation_all_green_on_driver_data(spark, sf_dir, duck):
    """The registered fixed suite passes end-to-end on the driver's
    synthetic star schema (violations exist only where the data
    really has them — asserted equal to DuckDB ground truth)."""
    from clinical_data_warehouse_bi_spark.queries.qa_report import q_expectations

    rep = {
        r["check_name"]: r["violations"]
        for r in q_expectations(spark, sf_dir).collect()
    }
    # spot-check two checks against independently-computed truth
    nulls = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IS NULL"
    ).fetchone()[0]
    assert rep["not_null:orders.o_custkey"] == nulls
    orphans = duck.execute(
        """SELECT count(*) FROM lineitem l LEFT JOIN orders o
           ON l.l_orderkey = o.o_orderkey
           WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert rep["referential:lineitem.l_orderkey->orders.o_orderkey"] == orphans


# ------------------------------------------- persisted BM25 index

def _index_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    first = docs.where(F.col("doc_id") < 400)
    second = docs.where(F.col("doc_id") >= 400)
    return docs, first, second


def test_bm25_index_build_append_matches_inline(spark, sf_dir, tmp_path):
    """base-build + one append must serve EXACTLY the relation the
    shuffle-free inline path computes over the union corpus: since
    round 13 the served total folds per-term contributions in fixed
    query order, so scores are bit-identical to the inline
    expression tree (this is what lets q_bm25_served carry
    q_bm25_topk's DuckDB oracle verbatim)."""
    docs, first, second = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    assert retrieval.bm25_index_append(second, path, "b1") is True

    terms = ["hash", "join", "spark"]
    served = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_index_search(spark, path, terms, 100_000).collect()
    }
    inline = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(docs, terms, 100_000).collect()
    }
    assert served == inline


def test_bm25_index_append_replay_is_noop(spark, sf_dir, tmp_path):
    docs, first, second = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    retrieval.bm25_index_append(second, path, "b1")
    before = sorted(
        (r["doc_id"], r["score"])
        for r in retrieval.bm25_index_search(spark, path, ["hash"], 10_000).collect()
    )
    # replayed delivery of the same batch: committed dir wins, no-op
    assert retrieval.bm25_index_append(second, path, "b1") is False
    after = sorted(
        (r["doc_id"], r["score"])
        for r in retrieval.bm25_index_search(spark, path, ["hash"], 10_000).collect()
    )
    assert before == after


def test_bm25_index_crash_leftover_is_recovered(spark, sf_dir, tmp_path):
    """A stale .tmp-batch dir (crash before the publish rename) is
    invisible to searches and swept by the retried append."""
    import os

    docs, first, second = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    stale = os.path.join(path, "postings", ".tmp-batch-b1")
    os.makedirs(os.path.join(stale, "tb=0"))
    with open(os.path.join(stale, "tb=0", "part-junk.parquet"), "w") as f:
        f.write("garbage")
    # search ignores the dot-dir
    retrieval.bm25_index_search(spark, path, ["hash"], 5).collect()
    # retried append sweeps it and commits
    assert retrieval.bm25_index_append(second, path, "b1") is True
    assert not os.path.isdir(stale)
    assert os.path.isdir(os.path.join(path, "postings", "batch=b1"))


def test_bm25_index_search_prunes_partitions(spark, sf_dir, tmp_path):
    """Scale contract: the postings scan partition-prunes to the
    query terms' tb= buckets and pushes term IN down to parquet."""
    docs, first, _ = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    plan = physical_plan(retrieval.bm25_index_search(spark, path, ["hash"], 10))
    assert "PartitionFilters" in plan and "tb" in plan
    assert "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_index_rejects_bad_batch_ids(spark, sf_dir, tmp_path):
    docs, first, _ = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    for bad in ["a=b", "a/b", ".hidden"]:
        with pytest.raises(ValueError):
            retrieval.bm25_index_append(first, path, bad)


def test_expectation_unique_absorbs_row_checks_one_scan(spark, sf_dir):
    """A table with BOTH a unique check and row-expression checks is
    scanned once: the row checks ride the unique aggregation's
    first level as per-key partial sums."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    spec = [
        {"check": "not_null", "table": "lineitem", "column": "l_quantity"},
        {"check": "accepted_range", "table": "lineitem",
         "column": "l_quantity", "lo": 1.0, "hi": 50.0},
        {"check": "unique", "table": "lineitem",
         "columns": ["l_orderkey", "l_linenumber"]},
    ]
    rep = qa.expectation_report(t, spec)
    assert physical_plan(rep).count("Scan parquet") == 1
    got = {r["check_name"]: r["violations"] for r in rep.collect()}
    assert len(got) == 3


# ------------------------------------------------- drift report

def test_drift_report_stable_vs_shifted(spark, sf_dir):
    """Identical snapshots score ~0 PSI; a shifted copy crosses the
    action threshold; PSI matches a numpy model bin-for-bin."""
    import math

    import numpy as np

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    base = li.select("l_quantity", "l_extendedprice")
    same = {
        r["column"]: r
        for r in qa.drift_report(base, base, ["l_quantity", "l_extendedprice"]).collect()
    }
    for c in same.values():
        assert c["psi"] < 0.01 and not c["drifted"]

    shifted = base.withColumn("l_quantity", F.col("l_quantity") * 2 + 10)
    rep = {
        r["column"]: r
        for r in qa.drift_report(
            base, shifted, ["l_quantity", "l_extendedprice"]
        ).collect()
    }
    assert rep["l_quantity"]["drifted"] and rep["l_quantity"]["psi"] > 0.2
    assert not rep["l_extendedprice"]["drifted"]

    # numpy model: same deciles, same epsilon floor, same formula
    qvals = base.approxQuantile("l_quantity", [i / 10 for i in range(1, 10)], 0.001)
    edges = sorted(set(qvals))
    bvals = np.array([r["l_quantity"] for r in base.select("l_quantity").collect()])
    cvals = bvals * 2 + 10
    def frac(v):
        bins = [None, *edges, None]
        out = []
        for b in range(len(edges) + 1):
            lo, hi = bins[b], bins[b + 1]
            m = np.ones(len(v), bool)
            if lo is not None:
                m &= v > lo
            if hi is not None:
                m &= v <= hi
            out.append(m.sum() / len(v))
        return out
    psi = sum(
        (max(q, 1e-4) - max(p, 1e-4)) * math.log(max(q, 1e-4) / max(p, 1e-4))
        for p, q in zip(frac(bvals), frac(cvals))
    )
    assert abs(rep["l_quantity"]["psi"] - psi) < 1e-9


def test_drift_report_one_scan_per_side(spark, sf_dir):
    """All columns' bin counts compile into one aggregation per
    snapshot: exactly two scans for any number of columns."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    import clinical_data_warehouse_bi_spark.qa as qa_mod

    seen = []
    orig = type(li).agg

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        seen.append(physical_plan(out).count("Scan parquet"))
        return out

    type(li).agg = spy
    try:
        qa_mod.drift_report(li, li, ["l_quantity", "l_discount", "l_tax"]).collect()
    finally:
        type(li).agg = orig
    assert seen and all(s == 1 for s in seen) and len(seen) == 2


# ------------------------------------------------- corpus card

def test_corpus_card_matches_duckdb_ground_truth(spark, sf_dir, duck, tmp_path):
    import json
    import os

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = str(tmp_path / "_card.json")
    card = qa.corpus_card(docs, out_path=out)

    n_docs, n_distinct, n_tokens = duck.execute(
        """SELECT count(*), count(DISTINCT text),
                  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
           FROM documents"""
    ).fetchone()
    assert card["n_docs"] == n_docs
    assert card["n_tokens"] == n_tokens
    assert abs(card["exact_dup_rate"] - (1 - n_distinct / n_docs)) < 1e-6
    assert card["tokens_per_doc"]["p50"] <= card["tokens_per_doc"]["p90"]
    assert sum(card["lang_mix"].values()) <= n_docs
    assert sum(card["source_mix"].values()) == n_docs
    with open(out) as f:
        assert json.load(f) == card
    assert os.path.basename(out).startswith("_")


def test_bm25_index_compaction_round_trip(spark, sf_dir, tmp_path):
    """Compaction rolls every batch into one base dir with summed
    stats; the served relation is unchanged, a mid-swap crash is
    recovered by the next search, and ingest continues cleanly."""
    import os

    docs, first, second = _index_corpus(spark, sf_dir)
    path = str(tmp_path / "bm25_idx")
    retrieval.bm25_index_build(first, path, n_buckets=8)
    retrieval.bm25_index_append(second, path, "b1")
    terms = ["hash", "join"]
    before = sorted(
        (r["doc_id"], r["score"])
        for r in retrieval.bm25_index_search(spark, path, terms, 100_000).collect()
    )
    res = retrieval.bm25_index_compact(spark, path)
    assert res["batches_before"] == 2 and res["batches_after"] == 1
    after = sorted(
        (r["doc_id"], r["score"])
        for r in retrieval.bm25_index_search(spark, path, terms, 100_000).collect()
    )
    assert after == before
    # mid-swap crash: live postings renamed away, recovery restores
    roots = os.path.join(path, "postings")
    os.rename(roots, f"{roots}.old-compact")
    again = sorted(
        (r["doc_id"], r["score"])
        for r in retrieval.bm25_index_search(spark, path, terms, 100_000).collect()
    )
    assert again == before
    # post-compaction ingest still works and serves
    extra = spark.createDataFrame(
        [(90_000, "hash join hash join fresh appended doc")],
        ["doc_id", "text"],
    )
    assert retrieval.bm25_index_append(extra, path, "b2") is True
    served = {
        r["doc_id"]
        for r in retrieval.bm25_index_search(spark, path, terms, 100_000).collect()
    }
    assert 90_000 in served


def test_observe_expectations_rides_an_action_for_free(spark, sf_dir):
    """Inline observation: the violation counters equal the dedicated
    expectation_report's, collected from the SAME action the
    pipeline was running anyway (no extra scan)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    spec = [
        {"check": "not_null", "table": "lineitem", "column": "l_quantity"},
        {"check": "accepted_range", "table": "lineitem",
         "column": "l_quantity", "lo": 1.0, "hi": 50.0},
        {"check": "accepted_values", "table": "lineitem",
         "column": "l_returnflag", "values": ["A", "N", "R"]},
    ]
    observed, obs = qa.observe_expectations(t["lineitem"], spec)
    n = observed.count()  # the pipeline's own action
    got = obs.get
    want = {
        r["check_name"]: r["violations"]
        for r in qa.expectation_report(t, spec).collect()
    }
    assert got["__total_rows"] == n
    for nm, v in want.items():
        assert got[nm] == v, nm

    import pytest as _pt

    with _pt.raises(ValueError):
        qa.observe_expectations(
            t["lineitem"],
            [{"check": "unique", "table": "lineitem", "columns": ["l_orderkey"]}],
        )
    with _pt.raises(ValueError):
        qa.observe_expectations(
            t["lineitem"],
            spec + [{"check": "not_null", "table": "orders", "column": "o_custkey"}],
        )


# ------------------------------------------------- hybrid fusion

def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(11, 1), (13, 2), (10, 3)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in retrieval.rrf_fuse([a, b], k=10, rrf_k=60).collect()
    }
    import pytest as _pt

    assert got[10] == _pt.approx(1 / 61 + 1 / 63, abs=1e-8)
    assert got[11] == _pt.approx(1 / 62 + 1 / 61, abs=1e-8)
    assert got[12] == _pt.approx(1 / 63, abs=1e-8)
    assert got[13] == _pt.approx(1 / 62, abs=1e-8)
    # doc in both lists outranks single-list docs
    order = [
        r["doc_id"]
        for r in retrieval.rrf_fuse([a, b], k=10).orderBy(
            F.col("rrf_score").desc(), "doc_id"
        ).collect()
    ]
    assert set(order[:2]) == {10, 11}
    with _pt.raises(ValueError):
        retrieval.rrf_fuse([], 5)


def test_hybrid_topk_combines_both_signals(spark, sf_dir):
    """The fused list contains k rows drawn from both legs, and a
    doc that tops BOTH legs tops the fusion."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    qvec = [float(r) for r in emb.where("vec_id = 7").first()["embedding"]]
    fused = retrieval.hybrid_topk(
        docs, emb, ["hash", "join"], qvec, k=10, pool=30
    ).collect()
    assert len(fused) == 10
    ids = [r["doc_id"] for r in fused]
    bm_ids = {
        r["doc_id"] for r in retrieval.bm25_topk(docs, ["hash", "join"], 30).collect()
    }
    # vec_id 7 is its own nearest neighbor: rank 1 on the dense leg
    assert 7 in ids
    # at least one fused doc came from the lexical leg
    assert any(i in bm_ids for i in ids)


def test_zipf_profile_discriminates_natural_vs_degenerate(spark, sf_dir):
    import math

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    nat = qa.zipf_profile(docs)
    assert nat["n_tokens"] > 0 and nat["vocab_size"] > 10
    assert nat["zipf_slope"] < 0  # frequency falls with rank
    # uniform-ish synthetic corpus: near-flat slope, entropy ~ log2(V)
    flat_docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(40)],
        ["doc_id", "text"],
    )
    flat = qa.zipf_profile(flat_docs)
    assert abs(flat["zipf_slope"]) < 0.05
    assert abs(flat["unigram_entropy_bits"] - math.log2(50)) < 1e-6
    # degenerate one-word corpus: zero entropy
    one = qa.zipf_profile(
        spark.createDataFrame([(0, "spam spam spam spam")], ["doc_id", "text"])
    )
    assert one["unigram_entropy_bits"] == 0.0 and one["vocab_size"] == 1


def test_corpus_card_lexical_section(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    card = qa.corpus_card(docs, lexical=True)
    assert card["lexical"]["zipf_slope"] < 0
    assert card["lexical"]["unigram_entropy_bits"] > 0
    assert card["lexical"]["vocab_size"] == qa.zipf_profile(docs)["vocab_size"]


@pytest.mark.slow
def test_hybrid_served_fuses_persisted_indexes(spark, sf_dir, tmp_path):
    """hybrid_topk_served: both legs come from their persisted
    indexes and the fusion is exactly the RRF of the two served
    lists (hand-recomputed) — the lexical leg is identical to the
    inline bm25 ranking; the dense leg is the IVF-PQ serving path."""
    from clinical_data_warehouse_bi_spark import similarity
    from clinical_data_warehouse_bi_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    vectors = read_table(spark, sf_dir, "embeddings")
    bm25_path = str(tmp_path / "bm25_idx")
    ivf_path = str(tmp_path / "ivf_idx")
    retrieval.bm25_index_build(docs, bm25_path, n_buckets=8)
    similarity.build_ivf_pq_index(vectors, ivf_path, n_clusters=4, m=4)

    terms = ["hash", "join", "spark"]
    k, pool = 15, 30
    fused = retrieval.hybrid_topk_served(
        spark, bm25_path, ivf_path, vectors, terms, k, pool=pool, nprobe=2
    )
    got = {r["doc_id"]: r["rrf_score"] for r in fused.collect()}
    assert len(got) == k

    # hand-recompute the fusion from the two served legs
    bm = retrieval.bm25_index_search(spark, bm25_path, terms, pool).collect()
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    dense = similarity.search_ivf_pq_index(
        spark, ivf_path, vectors, n_queries=1, nprobe=2,
        shortlist=max(2 * pool, 64), topk=pool,
    ).where("qid = 0").collect()
    dense_rank = {r["nid"]: r["rank"] for r in dense}
    scores = {}
    for d, rk in list(bm_rank.items()) + list(dense_rank.items()):
        scores[d] = scores.get(d, 0.0) + 1.0 / (60.0 + rk)
    want = dict(
        sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    )
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - round(want[d], 8)) < 1e-9, (d, got[d], want[d])


def test_bm25_served_repairs_corrupt_cache_dir(spark):
    """q_bm25_served self-heals a cache directory that exists but
    lost BM25_INDEX_META: the rebuild's publish rename must REPLACE
    the broken directory, never discard the build as a lost race and
    hand the search a meta-less index (the q_ann_ivf_pq_served
    repair contract, applied to the lexical index)."""
    import os
    import shutil

    from clinical_data_warehouse_bi_spark.queries.retrieval_ops import (
        _served_index_path,
        q_bm25_served,
    )
    from clinical_data_warehouse_bi_spark.retrieval import BM25_INDEX_META

    sf = "/root/testdata/sf0.001"
    path = _served_index_path(sf)
    n0 = q_bm25_served(spark, sf).count()  # builds + serves
    assert os.path.exists(os.path.join(path, BM25_INDEX_META))

    os.remove(os.path.join(path, BM25_INDEX_META))
    n1 = q_bm25_served(spark, sf).count()
    assert os.path.exists(os.path.join(path, BM25_INDEX_META))
    assert n1 == n0 > 0

    shutil.rmtree(path)
    assert q_bm25_served(spark, sf).count() == n0


def test_hybrid_served_graph_leg(spark, sf_dir, tmp_path):
    """hybrid_topk_served_graph: BM25 index leg + persisted graph-ANN
    dense leg, fused by RRF — the fusion must equal a hand-recompute
    from the two served legs (the hybrid_topk_served test's protocol,
    with the dense leg swapped for hnsw)."""
    from clinical_data_warehouse_bi_spark import retrieval
    from clinical_data_warehouse_bi_spark.hnsw import (
        build_hnsw_index,
        hnsw_index_search,
    )
    from clinical_data_warehouse_bi_spark.io import load_tables

    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    bm_path = str(tmp_path / "bm")
    g_path = str(tmp_path / "g")
    retrieval.bm25_index_build(t["documents"], bm_path, n_buckets=8)
    build_hnsw_index(t["embeddings"], g_path, n_shards=4, m=12)
    qvec = [
        float(x)
        for x in t["embeddings"].where(F.col("vec_id") == 0).first()["embedding"]
    ]
    terms = ["hash", "join", "spark"]
    pool, k = 30, 10
    fused = {
        r["doc_id"]: r["rrf_score"]
        for r in retrieval.hybrid_topk_served_graph(
            spark, bm_path, g_path, qvec, terms, k, pool=pool
        ).collect()
    }
    assert len(fused) == k
    # hand-recompute the fusion from the two served legs
    bm = retrieval.bm25_index_search(spark, bm_path, terms, pool).collect()
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    dn = hnsw_index_search(spark, g_path, [(0, qvec)], pool).collect()
    dn_rank = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(dn, key=lambda r: (-r["score"], r["vec_id"]))
        )
    }
    scores = {}
    for d, rk in list(bm_rank.items()) + list(dn_rank.items()):
        scores[d] = scores.get(d, 0.0) + 1.0 / (60.0 + rk)
    want = sorted(scores.items(), key=lambda t2: (-t2[1], t2[0]))[:k]
    assert set(fused) == {d for d, _ in want}
    for d, s in want:
        assert abs(fused[d] - round(s, 8)) < 1e-9
    # the dense query vector's own doc is a fused hit (vec 0 == doc 0)
    assert 0 in fused
