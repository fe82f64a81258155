"""Corpus-hygiene operators for LLM training-data pipelines: PII
scrubbing, repetition-based quality filtering, and benchmark
contamination checks. All three run as JVM-side expressions (regex /
split / aggregate built-ins — no Python in the hot path); the
contamination check is a bucketed equi-join on n-gram hashes, the
same candidates-only shape as the dedup LSH family.

Reference analogue: none — pure extension beyond the reference's
849-line surface (its cleansing layer, Stage_area.sql:85-147, is the
closest spirit: regex-guarded normalization before facts are
promoted). These are the operators a 100 TB pretraining corpus needs
between raw scrape and tokenizer.

Scale notes:
- PII scrubbing is a per-row regexp_replace chain — embarrassingly
  parallel, no shuffle, pushes nothing, needs nothing. Like every
  compute-heavy per-row stage, it runs at the SCAN's parallelism:
  pre-partition few-split local inputs with io.fan_out (no-op on a
  real many-split scan), and persist the gate's output when several
  downstream stages consume it.
- Repetition metrics are per-row split/aggregate expressions — one
  pass, no shuffle; thresholds filter before anything downstream
  shuffles (the cheap-reject-first rule).
- Contamination joins shuffle ONLY hashed n-grams (16-byte keys),
  never text; the benchmark side of the join is tiny and broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as an array column (nothing
    leaves the row — no explode here).

    Built as ``n - 1`` ``zip_with`` passes over shifted slices of the
    token array, NOT as a ``transform`` over indexes whose lambda
    slices ``toks``: higher-order functions evaluate their lambda
    body's non-argument subtrees PER ELEMENT (no codegen, no
    common-subexpression elimination inside the loop), so the
    index-lambda form re-ran the whole split-the-text expression once
    per gram — O(tokens x text_length) per row, measured at ~4 s for
    500 sf0.01 docs. The zip_with form evaluates each input array
    once per pass: O(n x tokens) per row (~50x faster there).

    ``concat`` (null-propagating), not ``concat_ws`` (null-skipping),
    so the zip_with tail padding yields null grams that the final
    guarded slice drops; gram count is size - n + 1."""
    n_tok = F.size(toks)
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(n_tok - j, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n_tok >= n, F.slice(grams, 1, n_tok - n + 1)).otherwise(
        F.array().cast("array<string>")
    )

#: PII patterns applied in order (order matters: emails before bare
#: domains would, e.g., double-redact). Each is (regex, replacement).
#: Deliberately conservative/high-precision: an over-eager scrubber
#: destroys training text, and recall tuning belongs to deployment.
PII_PATTERNS: list[tuple[str, str]] = [
    # email addresses
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # US SSN (###-##-####, strict dashes to stay high-precision)
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # international-ish phone numbers: optional +CC, separators, 7-15
    # digits total (grouped to avoid eating plain large numbers)
    (r"(?<![\d.])(?:\+?\d{1,3}[ .-])?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\d.])", "<PHONE>"),
    # IPv4 addresses
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 13-19 digit card-like numbers; separators only BETWEEN digits
    # (a trailing [ -]? would swallow the space after the number)
    (r"\b\d(?:[ -]?\d){12,18}\b", "<CARD>"),
]


def scrub_pii(col: Column | str, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Chained regexp_replace over ``PII_PATTERNS`` (or a caller
    list). Pure JVM expression: the chain fuses into one generated
    projection — a single pass over the string per row regardless of
    pattern count."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", ngram: int = 3
) -> DataFrame:
    """Gopher/FineWeb-style repetition signals per document, appended
    as columns — all built-in expressions, one pass, no shuffle:

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (repeated boilerplate / navigation chrome).
    - ``dup_ngram_frac``: fraction of word ``ngram``-grams that are
      duplicates — the classic repeated-phrase signal.
    - ``top_word_frac``: share of tokens taken by the single most
      frequent token (degenerate keyword-stuffing pages).

    Implementation: split to arrays, dedup with array_distinct, and
    compare sizes — O(tokens) per row in whole-stage codegen. The
    n-gram relation is built with transform over a sequence (no
    explode: nothing leaves the row)."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    toks = F.filter(
        F.split(F.lower(t), r"[^a-z0-9']+"), lambda x: x != F.lit("")
    )
    n_tok = F.size(toks)
    grams = _word_ngrams(toks, ngram)
    # most-frequent-token share: sort the token array and take the
    # longest run of equal neighbors — O(n log n) per row (the naive
    # per-distinct-token count is O(distinct x tokens), quadratic on
    # exactly the big pages this metric must stay cheap on).
    run_acc = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def run_step(acc: Column, w: Column) -> Column:
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(
        F.array_sort(toks), run_acc, run_step, lambda acc: acc["best"]
    )
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    return docs.withColumns(
        {
            "dup_line_frac": safe(
                F.size(lines) - F.size(F.array_distinct(lines)),
                F.size(lines),
            ).cast("double"),
            "dup_ngram_frac": safe(
                F.size(grams) - F.size(F.array_distinct(grams)),
                F.size(grams),
            ).cast("double"),
            "top_word_frac": safe(top_count, n_tok).cast("double"),
        }
    )


def repetition_filter(
    docs: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_ngram_frac: float = 0.50,
    max_top_word_frac: float = 0.20,
) -> DataFrame:
    """Keep documents under all three repetition thresholds (defaults
    in the Gopher-rule neighborhood). Filter runs in the same
    projection pass as the metrics — reject cheap, before anything
    shuffles."""
    m = repetition_metrics(docs, text_col)
    return m.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_ngram_frac") <= max_dup_ngram_frac)
        & (F.col("top_word_frac") <= max_top_word_frac)
    )


def _ngram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_hash) long-form relation: lowercase word n-grams
    hashed to 64 bits (xxhash64) BEFORE the explode, so only 8-byte
    keys ever shuffle — never text."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+"), lambda x: x != F.lit("")
    )
    grams = F.transform(_word_ngrams(toks, n), lambda g: F.xxhash64(g))
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram_hash")
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap_frac: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: which corpus documents contain a
    large fraction of some benchmark item's word ``n``-grams (the
    standard n-gram-overlap decontamination rule; n=8 is the
    PaLM/GPT-3 convention). Returns (corpus_id, bench_id,
    bench_grams, hit_grams, overlap_frac) for pairs at or above
    ``min_overlap_frac``.

    Scale shape: both sides reduce to (id, gram_hash) with hashing
    BEFORE explode; the benchmark side is small by definition and
    broadcast, so the probe is a map-side hash join over the corpus
    grams — no all-pairs, no corpus shuffle. The per-pair aggregation
    groups on (corpus_id, bench_id) — cardinality bounded by actual
    collisions, not the cross product."""
    c = _ngram_hashes(corpus, corpus_id, text_col, n).withColumnRenamed(
        corpus_id, "__cid"
    )
    b = _ngram_hashes(benchmark, bench_id, text_col, n).withColumnRenamed(
        bench_id, "__bid"
    )
    bench_sizes = F.broadcast(
        b.groupBy("__bid").agg(F.count("*").alias("bench_grams"))
    )
    hits = (
        c.join(F.broadcast(b), "gram_hash")
        .groupBy("__cid", "__bid")
        .agg(F.count("*").alias("hit_grams"))
    )
    return (
        hits.join(bench_sizes, "__bid")
        .withColumn(
            "overlap_frac",
            (F.col("hit_grams") / F.col("bench_grams")).cast("double"),
        )
        .filter(F.col("overlap_frac") >= min_overlap_frac)
        .select(
            F.col("__cid").alias(corpus_id),
            F.col("__bid").alias(bench_id),
            "bench_grams",
            "hit_grams",
            "overlap_frac",
        )
    )
