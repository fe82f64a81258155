"""Unigram-LM tokenizer (unigram.py): Viterbi vs an independent
Python DP, vocabulary learning on planted repeated substrings,
round-trip and determinism, and the distributed E-step's exactness
against a driver-side recomputation."""

from __future__ import annotations

import math

import pytest

from clinical_data_warehouse_bi_spark import unigram


def _viterbi_independent(word, logp, max_len):
    """Second implementation with a different loop structure
    (forward scan keeping per-position best lists)."""
    n = len(word)
    INF = float("-inf")
    score = {0: (0.0, None, None)}
    for i in range(1, n + 1):
        best = (INF, None, None)
        for ln in range(1, min(max_len, i) + 1):
            j = i - ln
            if j not in score:
                continue
            piece = word[j:i]
            lp = logp.get(piece, -100.0 if ln == 1 else None)
            if lp is None:
                continue
            cand = score[j][0] + lp
            if cand > best[0]:
                best = (cand, j, piece)
        if best[0] > INF:
            score[i] = best
    pieces = []
    i = n
    while i > 0:
        _, j, piece = score[i]
        pieces.append(piece)
        i = j
    return list(reversed(pieces))


def test_viterbi_matches_independent_dp():
    logp = {
        "a": -2.0, "b": -2.0, "c": -2.5, "ab": -1.0, "bc": -1.2,
        "abc": -1.1, "cab": -3.0,
    }
    import itertools
    import random

    rng = random.Random(4)
    words = ["abc", "abcabc", "cab", "bca", "aabbcc", "xyz", "axbycz"] + [
        "".join(rng.choice("abcx") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    for w in words:
        got = unigram._viterbi(w, logp, 3)
        want = _viterbi_independent(w, logp, 3)
        assert "".join(got) == w  # round trip always
        gs = sum(logp.get(p, -100.0) for p in got)
        ws = sum(logp.get(p, -100.0) for p in want)
        assert abs(gs - ws) < 1e-12, (w, got, want)


def test_train_learns_planted_pieces(spark):
    # a corpus dominated by two long repeated strings: the learned
    # vocabulary must keep them as single pieces, and encoding must
    # use them (token count near word count, far below char count)
    rows = []
    for i in range(300):
        rows.append((i, "internationalization telemetry " * 3))
    for i in range(300, 400):
        rows.append((i, "assorted filler words here " * 2))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logp = unigram.train_unigram(
        docs, vocab_size=120, max_piece_len=24, min_count=1
    )
    assert "internationalization" in logp
    assert "telemetry" in logp
    # probabilities normalize (sum of exp <= 1 + eps; pruning keeps
    # renormalized mass at exactly 1 after the final EM round)
    assert abs(sum(math.exp(v) for v in logp.values()) - 1.0) < 1e-6
    enc = unigram.unigram_encode(docs.limit(10), logp, max_piece_len=24)
    out = enc.collect()
    for r in out:
        assert r["n_pieces"] == 6  # 2 words x 3 reps, one piece each


def test_train_is_deterministic(spark):
    rows = [(i, f"alpha beta gamma delta {i % 7}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = unigram.train_unigram(docs, vocab_size=64, min_count=1)
    b = unigram.train_unigram(docs, vocab_size=64, min_count=1)
    assert a == b
    assert len(a) <= 64 + 36  # vocab target + protected single chars


def test_single_chars_survive_pruning_and_oov_encodes(spark):
    rows = [(i, "zebra quokka " * 5) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logp = unigram.train_unigram(docs, vocab_size=16, min_count=1)
    for ch in set("zebraquokka"):
        assert ch in logp  # segmentability floor
    # an unseen word still encodes (single-char fallback)
    oov = spark.createDataFrame([(1, "jumpy wizard")], "doc_id long, text string")
    out = unigram.unigram_encode(oov, logp).collect()[0]
    assert "".join(out["pieces"]) == "jumpywizard"


def test_expected_counts_match_driver_recomputation(spark):
    from clinical_data_warehouse_bi_spark.bpe import word_histogram

    rows = [(i, "aa ab aab") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hist = word_histogram(docs, min_count=1)
    logp = {"a": math.log(0.3), "b": math.log(0.2), "aa": math.log(0.4),
            "ab": math.log(0.1)}
    got = unigram._expected_counts(hist, logp, 2)
    want: dict[str, float] = {}
    for r in hist.collect():
        for p in unigram._viterbi(r["word"], logp, 2):
            want[p] = want.get(p, 0.0) + r["n"]
    assert got == want


def test_rejects_tiny_vocab(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram.train_unigram(docs, vocab_size=1)


def test_vocab_below_alphabet_raises_instead_of_hanging(spark):
    """Protected single chars can never be pruned, so a vocab_size
    below the corpus alphabet used to spin the prune loop forever;
    it must surface a ValueError once only singles remain."""
    # 26 + 10 = 36 distinct single-char words > vocab_size=32, and
    # no multi-char piece exists to prune at all
    alphabet = " ".join("abcdefghijklmnopqrstuvwxyz0123456789")
    rows = [(1, alphabet)] * 5
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="alphabet"):
        unigram.train_unigram(docs, vocab_size=32, min_count=1)


def test_nbest_contains_viterbi_and_is_sorted():
    logp = {"a": -2.0, "b": -2.0, "ab": -1.0, "ba": -1.5, "aba": -1.2}
    for w in ("ababa", "aabb", "ba", "abab"):
        cands = unigram._nbest(w, logp, 3, 6)
        # round trip on every candidate, scores non-increasing
        for s, segs in cands:
            assert "".join(segs) == w
            assert abs(s - sum(logp.get(p, -100.0) for p in segs)) < 1e-12
        scores = [s for s, _ in cands]
        assert scores == sorted(scores, reverse=True)
        # the best equals Viterbi's score
        vit = unigram._viterbi(w, logp, 3)
        assert abs(scores[0] - sum(logp.get(p, -100.0) for p in vit)) < 1e-12
        # n-best paths are distinct
        assert len({tuple(p) for _, p in cands}) == len(cands)


def test_sampled_encode_reproducible_and_diverse(spark):
    rows = [(i, "ababa " * 20) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.3),
            "ba": math.log(0.2), "aba": math.log(0.1)}
    one = {r["doc_id"]: r["pieces"]
           for r in unigram.unigram_encode_sampled(
               docs, logp, alpha=0.3, seed="e1").collect()}
    two = {r["doc_id"]: r["pieces"]
           for r in unigram.unigram_encode_sampled(
               docs, logp, alpha=0.3, seed="e1").collect()}
    other = {r["doc_id"]: r["pieces"]
             for r in unigram.unigram_encode_sampled(
                 docs, logp, alpha=0.3, seed="e2").collect()}
    assert one == two                         # same seed: exact replay
    assert one != other                       # new epoch seed: new stream
    # round trip holds for every sampled segmentation
    for pieces in one.values():
        assert "".join(pieces) == "ababa" * 20
    # diversity: across 40 docs x 20 occurrences, multiple distinct
    # segmentations of the same word appear
    segs = {tuple(p) for pieces in one.values() for p in [pieces[:3]]}
    assert len(segs) >= 2


def test_sampled_encode_high_alpha_degenerates_to_viterbi(spark):
    rows = [(1, "ababa ababa")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.3),
            "ba": math.log(0.2), "aba": math.log(0.1)}
    out = unigram.unigram_encode_sampled(
        docs, logp, alpha=50.0, seed="x").collect()[0]["pieces"]
    vit = unigram._viterbi("ababa", logp, 8)
    assert out == vit + vit
    import pytest

    with pytest.raises(ValueError):
        unigram.unigram_encode_sampled(docs, logp, alpha=-1.0)
