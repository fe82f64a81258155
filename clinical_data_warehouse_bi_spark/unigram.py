"""Unigram-LM subword tokenizer training and encoding (Kudo 2018,
the SentencePiece unigram algorithm) — the second of the two public
subword families next to bpe.py, and the one that yields a
probabilistic vocabulary (sampling-based subword regularization
needs it; BPE's merge table cannot give piece probabilities).

Spark-first construction, the bpe.py reasoning carried over: the
algorithm depends ONLY on the word-frequency histogram, never the
corpus layout — so training reduces to (1) ONE distributed histogram
job, (2) ONE distributed substring-seed job, then (3) EM rounds
whose E-step runs DISTRIBUTED over the histogram relation (Viterbi
segmentation per distinct word inside mapInPandas, vocabulary
broadcast by closure) and whose M-step is a groupBy-sum back to the
driver-held vocabulary (bounded: the target vocab size, not the
corpus). Per EM round: one Spark job, O(vocab) driver traffic — the
train_logreg iteration discipline.

Viterbi-EM (hard EM) is the documented simplification vs
forward-backward soft counts: it converges to the same kind of
vocabulary on natural corpora, keeps every number exactly
reproducible (max, not logsumexp — no float-order sensitivity
across partitions), and is what the tests pin against an
independent Python dynamic program.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.bpe import word_histogram

_TOKEN_RE = None


def _tokens_py_mirror(text: str | None) -> list[str]:
    """Python mirror of text.tokens() (regexp_extract_all of
    '[a-z0-9]+' over the lowercased string) — encoding MUST
    tokenize exactly like the training histogram did. NOTE:
    scrub._tokens_py is a DIFFERENT tokenizer (it keeps
    apostrophes) and must not be used here."""
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall((text or "").lower())


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs; single
    unknown characters fall back to a large negative constant so
    every word stays segmentable."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = -100.0  # OOV single char fallback
                else:
                    continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return list(reversed(out))


def seed_vocab(
    hist: DataFrame,
    n_seed: int,
    max_piece_len: int = 8,
) -> DataFrame:
    """Candidate pieces: every substring (length <= max_piece_len)
    of every histogram word, weighted by word count, top ``n_seed``
    by total mass. Single characters that make the seed are never
    pruned afterwards (the segmentability floor); a character rare
    enough to miss the seed entirely is still encodable via the
    Viterbi OOV single-char fallback.

    One distributed explode -> sum -> TakeOrdered job; the substring
    fan-out is per-word O(len * max_piece_len), map-side, against
    the HISTOGRAM (distinct words), never the corpus."""
    sub = hist.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(i, least(length(word), i + {int(max_piece_len) - 1})), "
                "j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
        F.col("n"),
    )
    return (
        sub.groupBy("piece")
        .agg(F.sum("n").alias("mass"))
        .orderBy(F.desc("mass"), F.asc("piece"))
        .limit(int(n_seed))
    )


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 1024,
    text_col: str = "text",
    n_seed: int | None = None,
    max_piece_len: int = 8,
    em_rounds: int = 3,
    prune_frac: float = 0.25,
    min_count: int = 2,
    max_words: int | None = 200_000,
) -> dict[str, float]:
    """Train a unigram vocabulary: returns {piece: logprob}.

    Loop: seed (one job) -> repeat [E-step job: Viterbi-segment the
    histogram words under the current vocab, emit per-piece expected
    counts; M-step: renormalize; prune the lowest-mass multi-char
    pieces by ``prune_frac``] until the vocabulary reaches
    ``vocab_size``, then ``em_rounds`` final refinement rounds.

    Single characters are never pruned (every string stays
    encodable). Driver state is the vocabulary alone; each round is
    ONE Spark job over the histogram relation."""
    if vocab_size < 2:
        raise ValueError("vocab_size must be at least 2")
    hist = word_histogram(
        docs, text_col=text_col, min_count=min_count, max_words=max_words
    ).select(F.col("word"), F.col("n"))
    hist = hist.persist()
    try:
        seed_n = n_seed or vocab_size * 4
        seeded = seed_vocab(hist, seed_n, max_piece_len).collect()
        total = sum(r["mass"] for r in seeded) or 1
        logp = {
            r["piece"]: math.log(r["mass"] / total) for r in seeded
        }

        def em_round(cur: dict[str, float]) -> dict[str, float]:
            counts = _expected_counts(hist, cur, max_piece_len)
            # segmentability floor: a single-char piece whose mass
            # Viterbi fully reassigned to longer pieces must SURVIVE
            # the M-step (with a smoothing count), or OOV words stop
            # being encodable — hard EM's known degenerate step
            for p in cur:
                if len(p) == 1:
                    counts[p] = max(counts.get(p, 0.0), 1e-6)
            tot = sum(counts.values()) or 1
            return {
                p: math.log(c / tot) for p, c in counts.items() if c > 0
            }

        # prune-refine until at target size
        while True:
            logp = em_round(logp)
            multi = sorted(
                ((p, lp) for p, lp in logp.items() if len(p) > 1),
                key=lambda x: (x[1], x[0]),
            )
            single = {p: lp for p, lp in logp.items() if len(p) == 1}
            if len(logp) <= vocab_size:
                break
            if not multi:
                # Every surviving piece is a protected single char:
                # pruning can make no further progress, so a
                # vocab_size below the corpus alphabet would loop
                # forever. Surface the impossibility instead.
                raise ValueError(
                    f"vocab_size={vocab_size} is smaller than the "
                    f"corpus alphabet ({len(single)} single-char "
                    "pieces, which are never pruned); raise "
                    "vocab_size above the alphabet size"
                )
            n_drop = max(
                1, min(len(multi), int(len(multi) * prune_frac),
                       len(logp) - vocab_size)
            )
            kept = dict(multi[n_drop:])
            kept.update(single)
            logp = kept
        for _ in range(max(0, em_rounds - 1)):
            logp = em_round(logp)
        return logp
    finally:
        hist.unpersist()


def _expected_counts(
    hist: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Distributed E-step: Viterbi-segment every histogram word
    under the broadcast vocabulary, weight piece uses by the word's
    corpus count, reduce per piece. One mapInPandas + one groupBy
    over a relation bounded by words x avg_pieces."""
    import pandas as pd

    vocab = dict(logp)
    mpl = int(max_piece_len)

    def op(batches):
        for pdf in batches:
            rows = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                for piece in _viterbi(word, vocab, mpl):
                    rows[piece] = rows.get(piece, 0.0) + float(n)
            yield pd.DataFrame(
                {"piece": list(rows), "c": list(rows.values())}
            )

    parts = hist.mapInPandas(op, "piece string, c double")
    return {
        r["piece"]: r["c"]
        for r in parts.groupBy("piece").agg(F.sum("c").alias("c")).collect()
    }


def unigram_encode(
    docs: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    max_piece_len: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces): Viterbi-encode each
    document under the trained vocabulary — Arrow-batched, with a
    per-batch word cache (corpora repeat words; each distinct word
    is segmented once per batch, the bpe_encode discipline). The
    vocabulary is closure-broadcast; nothing shuffles."""
    import pandas as pd

    vocab = dict(logp)
    mpl = int(max_piece_len)

    def op(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            out_pieces = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                for w in _tokens_py_mirror(text):
                    got = cache.get(w)
                    if got is None:
                        got = _viterbi(w, vocab, mpl)
                        cache[w] = got
                    pieces.extend(got)
                out_pieces.append(pieces)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": out_pieces,
                    "n_pieces": [len(p) for p in out_pieces],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        op, f"{id_col} long, pieces array<string>, n_pieces int"
    )


def _nbest(word: str, logp: dict[str, float], max_len: int, n: int):
    """N-best segmentations by total log-prob (beam over the exact
    DP lattice: per position keep the n best (score, backpointer)
    pairs — exact n-best for an additive score)."""
    best: list[list[tuple[float, int, int, str]]] = [[(0.0, -1, -1, "")]] + [
        [] for _ in range(len(word))
    ]
    for i in range(1, len(word) + 1):
        cands = []
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = -100.0
                else:
                    continue
            for rank, (s, _, _, _) in enumerate(best[j]):
                cands.append((s + lp, j, rank, piece))
        cands.sort(key=lambda x: (-x[0], x[3]))
        best[i] = cands[:n]
    out = []
    for s, j, rank, piece in best[len(word)]:
        pieces = [piece]
        while j > 0:
            s2, j2, rank2, piece2 = best[j][rank]
            pieces.append(piece2)
            j, rank = j2, rank2
        out.append((s, list(reversed(pieces))))
    return out


def unigram_encode_sampled(
    docs: DataFrame,
    logp: dict[str, float],
    alpha: float = 0.2,
    seed: str = "sr0",
    n_best: int = 8,
    text_col: str = "text",
    max_piece_len: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Subword-regularization encoding (Kudo 2018 §3): sample a
    segmentation from the n-best lattice with probability
    ∝ P(seg)^alpha instead of always taking the Viterbi path —
    the training-time augmentation that makes models robust to
    tokenization ambiguity, and the capability that motivates a
    probabilistic vocabulary over BPE's merge table.

    Sampling is DETERMINISTIC per (seed, doc, word occurrence):
    the uniform comes from md5, the repo's replay rule — re-running
    an epoch with the same seed reproduces the same token stream
    exactly (epoch diversity = vary the seed), so downstream shard
    writes stay idempotent. alpha -> inf degenerates to Viterbi;
    alpha = 0 samples uniformly over the n-best.

    Same plan shape as unigram_encode: Arrow-batched, vocabulary
    closure-broadcast, nothing shuffles. The per-batch cache keys on
    the WORD ONLY for the n-best lattice (expensive part); the
    per-occurrence draw stays occurrence-unique."""
    import hashlib

    import pandas as pd

    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    vocab = dict(logp)
    mpl = int(max_piece_len)
    nb = int(n_best)

    def op(batches):
        for pdf in batches:
            lattice_cache: dict[str, list] = {}
            out_pieces = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for occ, w in enumerate(_tokens_py_mirror(text)):
                    cands = lattice_cache.get(w)
                    if cands is None:
                        cands = _nbest(w, vocab, mpl, nb)
                        lattice_cache[w] = cands
                    if len(cands) == 1:
                        pieces.extend(cands[0][1])
                        continue
                    scores = [s * alpha for s, _ in cands]
                    m = max(scores)
                    weights = [math.exp(s - m) for s in scores]
                    total = sum(weights)
                    u = (
                        int(
                            hashlib.md5(
                                f"{seed}:{doc_id}:{occ}:{w}".encode()
                            ).hexdigest()[:8],
                            16,
                        )
                        / 16**8
                    ) * total
                    acc = 0.0
                    pick = len(cands) - 1  # float-sum guard: default last
                    for idx, wgt in enumerate(weights):
                        acc += wgt
                        if u < acc:
                            pick = idx
                            break
                    pieces.extend(cands[pick][1])
                out_pieces.append(pieces)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": out_pieces,
                    "n_pieces": [len(p) for p in out_pieces],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        op, f"{id_col} long, pieces array<string>, n_pieces int"
    )
