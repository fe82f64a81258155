"""Cross-document repeated n-gram span removal (text.remove_repeated_spans):
planted-span semantics, an independent Python reference model on the real
corpus, edge cases, and the no-text-in-exchange plan discipline."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import text as T

N = 4


def _toks(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


def _py_model(docs: list[tuple[str, str]], n: int, max_occ: int):
    """Independent reference: dict-of-ngram occurrence lists, the
    globally first max_occ occurrences kept, every later occurrence's
    covered positions unioned away."""
    occ: dict[tuple, list[tuple[str, int]]] = {}
    toks = {d: _toks(t) for d, t in docs}
    for d, _ in sorted(docs):
        w = toks[d]
        for i in range(len(w) - n + 1):
            occ.setdefault(tuple(w[i : i + n]), []).append((d, i))
    removed: dict[str, set[int]] = {d: set() for d, _ in docs}
    for g, places in occ.items():
        for d, p in sorted(places)[max_occ:]:
            removed[d].update(range(p, p + n))
    out = {}
    for d, _ in docs:
        w = toks[d]
        kept = [w[i] for i in range(len(w)) if i not in removed[d]]
        out[d] = (len(w), len(removed[d] & set(range(len(w)))), " ".join(kept))
    return out


def test_planted_repeated_span_removed(spark):
    boiler = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            ("a", f"alpha bravo {boiler} charlie"),
            ("b", f"delta {boiler} echo foxtrot"),
            ("c", "golf hotel india juliet kilo"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in T.remove_repeated_spans(docs, ngram=5, max_occurrences=1).collect()
    }
    # doc a is globally first -> keeps the span verbatim
    assert "subscribe to our newsletter today" in out["a"]["clean_text"]
    assert out["a"]["n_removed"] == 0
    # doc b loses exactly the 5 covered tokens
    assert "subscribe" not in out["b"]["clean_text"]
    assert out["b"]["clean_text"] == "delta echo foxtrot"
    assert out["b"]["n_removed"] == 5
    # untouched doc passes through
    assert out["c"]["clean_text"] == "golf hotel india juliet kilo"
    assert out["c"]["n_removed"] == 0


def test_overlap_removal_wins(spark):
    # doc b repeats a's window shifted by one: the two removal spans
    # overlap and their union is removed; a token inside BOTH a kept
    # first-occurrence window and a later repeated window is dropped
    docs = spark.createDataFrame(
        [
            ("a", "p q r s t u"),
            ("b", "p q r s t u"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in T.remove_repeated_spans(docs, ngram=3, max_occurrences=1).collect()
    }
    assert out["a"]["clean_text"] == "p q r s t u"
    assert out["b"]["clean_text"] == ""
    assert out["b"]["n_removed"] == 6


def test_edge_cases(spark):
    docs = spark.createDataFrame(
        [("e", ""), ("s", "one two"), ("p", "...!!!")],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in T.remove_repeated_spans(docs, ngram=4).collect()
    }
    assert rows["e"]["clean_text"] == "" and rows["e"]["n_tokens"] == 0
    # shorter than n: pass-through, normalized join
    assert rows["s"]["clean_text"] == "one two" and rows["s"]["n_removed"] == 0
    assert rows["p"]["n_tokens"] == 0

    with pytest.raises(ValueError):
        T.remove_repeated_spans(docs, ngram=1)


def test_matches_python_model_on_corpus(spark, sf_dir):
    docs_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    pairs = [(r["doc_id"], r["text"]) for r in docs_df.collect()]
    expect = _py_model(pairs, N, 1)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in T.remove_repeated_spans(docs_df, ngram=N).collect()
    }
    assert got == expect


def test_max_occurrences_threshold(spark):
    # the same tri-gram in 3 docs survives everywhere at max_occ=3,
    # loses two occurrences at max_occ=1 — and, the round-8 advice's
    # distinguishing case, keeps exactly the FIRST TWO at max_occ=2
    # (the old behavior wrongly collapsed to one survivor)
    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", "x y z")],
        "doc_id string, text string",
    )
    lax = T.remove_repeated_spans(docs, ngram=3, max_occurrences=3)
    assert all(r["n_removed"] == 0 for r in lax.collect())
    strict = T.remove_repeated_spans(docs, ngram=3, max_occurrences=1)
    out = {r["doc_id"]: r["n_removed"] for r in strict.collect()}
    assert out == {"a": 0, "b": 3, "c": 3}
    two = T.remove_repeated_spans(docs, ngram=3, max_occurrences=2)
    out2 = {r["doc_id"]: r["n_removed"] for r in two.collect()}
    assert out2 == {"a": 0, "b": 0, "c": 3}
    pairs = [("a", "x y z"), ("b", "x y z"), ("c", "x y z")]
    assert out2 == {
        d: t[1] for d, t in _py_model(pairs, 3, 2).items()
    }


def test_no_text_in_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = T.remove_repeated_spans(docs, ngram=5)
    plan = out._jdf.queryExecution().toString()
    # the round-8 advice's sharpened form: the first line after an
    # 'Exchange' token is only the partitioning KEY list, so also
    # assert the keep-first window's hash exchange never becomes a
    # SortMergeJoin shuffle of the token arrays — the rebuild join
    # must stay broadcast at test scale (its at-scale doc-id shuffle
    # is the documented contract, not this plan)
    assert "SortMergeJoin" not in plan, plan[:2000]
    for seg in plan.split("Exchange")[1:]:
        head = seg.split("\n", 1)[0]
        assert "text#" not in head and "w#" not in head, head
    # and the formatted plan's Exchange operators must carry no
    # text/token-array payload in their declared Input schemas (the
    # payload check the head-line grep above cannot see)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    fplan = buf.getvalue()
    exchange_inputs = []
    lines = fplan.splitlines()
    for i, line in enumerate(lines):
        if ") Exchange" in line and "Reused" not in line:
            for follow in lines[i + 1 : i + 6]:
                if follow.startswith("Input"):
                    exchange_inputs.append(follow)
                    break
    assert exchange_inputs, fplan[:1500]
    for payload in exchange_inputs:
        cols = payload.split(":", 1)[1]
        assert "text#" not in cols and " w#" not in cols, payload


# --------------------------------------------------- chunk_text


def _chunks_py(text, chunk=256, overlap=32):
    w = [t for t in (text or "").split() if t]
    if not w:
        return []
    stride = chunk - overlap
    import math

    k = 1 + math.ceil(max(len(w) - chunk, 0) / stride)
    return [
        (i, i * stride, min(i * stride + chunk, len(w)),
         " ".join(w[i * stride: i * stride + chunk]))
        for i in range(k)
    ]


def test_chunk_text_matches_python_model(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.text import chunk_text

    docs = read_table(spark, sf_dir, "documents").limit(200)
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["token_start"], r["token_end"],
         r["chunk_text"])
        for r in chunk_text(docs, 64, 16).collect()
    )
    want = sorted(
        (r["doc_id"], i, s, e, t)
        for r in docs.select("doc_id", "text").collect()
        for i, s, e, t in _chunks_py(r["text"], 64, 16)
    )
    assert got == want and len(got) > 0


def test_chunk_text_overlap_and_coverage(spark):
    from clinical_data_warehouse_bi_spark.text import chunk_text

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"].split())
        for r in chunk_text(df, 40, 10).collect()
    )
    # stride 30: chunks at 0, 30, 60, 90(..100)
    assert [i for i, _ in rows] == [0, 1, 2]
    assert rows[0][1][-10:] == rows[1][1][:10]     # exact overlap
    assert rows[1][1][-10:] == rows[2][1][:10]
    covered = set()
    for _, toks in rows:
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(100)}  # every token kept


def test_chunk_text_short_and_empty_docs(spark):
    from clinical_data_warehouse_bi_spark.text import chunk_text

    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    rows = chunk_text(df, 40, 10).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["chunk_text"] == "just three tokens"
    assert rows[0]["token_end"] == 3


def test_chunk_text_no_exchange(spark, sf_dir):
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.text import chunk_text

    docs = read_table(spark, sf_dir, "documents")
    plan = chunk_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_chunk_text_rejections(spark):
    import pytest as _pytest

    from clinical_data_warehouse_bi_spark.text import chunk_text

    with _pytest.raises(ValueError):
        chunk_text(None, 0, 0)
    with _pytest.raises(ValueError):
        chunk_text(None, 10, 10)


def test_chunks_feed_the_persisted_bm25_index(spark, sf_dir, tmp_path):
    """RAG composition: documents -> overlapping chunks -> persisted
    BM25 index over chunks -> search returns the planted chunk and
    maps back to (doc_id, chunk_idx, token span)."""
    from clinical_data_warehouse_bi_spark import retrieval
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.text import chunk_text

    docs = read_table(spark, sf_dir, "documents").limit(50)
    marker = "zqxjkwombat"
    planted = docs.sparkSession.createDataFrame(
        [(999_999, " ".join(["filler"] * 70) + f" {marker} trailing words")],
        "doc_id long, text string",
    )
    chunks = chunk_text(
        docs.select("doc_id", "text").unionByName(planted), 64, 16
    ).select(
        (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    path = str(tmp_path / "bm25_chunks")
    retrieval.bm25_index_build(chunks, path)
    hits = retrieval.bm25_index_search(spark, path, [marker], k=3).collect()
    assert hits and hits[0]["doc_id"] // 10000 == 999_999
    assert hits[0]["doc_id"] % 10000 == 1  # marker sits in chunk 1 (token 70)
