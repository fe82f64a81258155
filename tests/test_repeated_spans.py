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
