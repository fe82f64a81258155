"""Text-analysis queries over `documents` (north-star extensions):
stats/token counting, quality scoring, language ID, fingerprinting.
All built-in-function only (JVM-side, codegen) and oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import text as T
from clinical_data_warehouse_bi_spark.io import fan_out, load_tables
from clinical_data_warehouse_bi_spark.registry import register

_SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# language lexicon rendered once for the oracle (MUST mirror T.LANG_LEXICON)
_LEX_VALUES = ", ".join(f"('{lang}', '{w}')" for lang, w in T.LANG_LEXICON)
_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in T.EN_STOPWORDS) + "]"


#: q_text_stats' DuckDB oracle, preserved after its round-7 registry
#: retirement (slot went to q_fuzzy_match) — the cross-engine value
#: check survives in tests/test_retired_parity.py.
SQL_TEXT_STATS = f"""
    WITH t AS (
      SELECT doc_id, text, {_SQL_TOKENS} AS toks,
             length(text) AS n_chars_actual,
             length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum_chars,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
      FROM documents)
    SELECT doc_id, n_chars_actual,
           len(toks) AS n_tokens,
           n_bpe_tokens,
           CAST(alnum_chars AS DOUBLE) / greatest(len(toks), 1) AS avg_token_len,
           CAST(n_chars_actual
                - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                AS DOUBLE) / greatest(n_chars_actual, 1) AS punct_ratio
    FROM t
    """


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document statistics: whitespace/alnum token
    count, a BPE-ish regex token count (letters runs | single digits |
    single punctuation — the GPT-2-style pre-tokenizer shape), average
    token length, punctuation ratio. Pure per-row expressions: no
    shuffle at all; scales linearly. fan_out so the regexp work is not
    serialized on a one-row-group local scan (no-op on real splits).

    Round-7 registry retirement (cap is 50; slot went to
    q_fuzzy_match): the token-count leg (size of the shared T.tokens
    relation) stays hash-checked every round through q_quality_score's
    registered n_tokens column, and the per-row-expression operator
    shape (P-class projections over documents) is carried by
    q_quality_score and q_repetition_filter. The BPE-regex count,
    avg-token-length, and punctuation-ratio expressions keep their own
    full oracle comparison in tests/test_retired_parity.py against
    SQL_TEXT_STATS. Kept unregistered as the narrow-API form."""
    docs = fan_out(load_tables(spark, sf_dir, ("documents",))["documents"])
    toks = T.tokens("text")
    n_chars = F.length("text")
    alnum = F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    bpe = F.expr(r"size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0))")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
        (alnum.cast("double") / F.greatest(F.size(toks), F.lit(1))).alias("avg_token_len"),
        (
            (n_chars - F.length(F.regexp_replace("text", r"[^a-zA-Z0-9\s]", "")))
            .cast("double")
            / F.greatest(n_chars, F.lit(1))
        ).alias("punct_ratio"),
    )


def _lang_argmax_sql() -> str:
    """The lexicon-hit argmax as ONE SQL expression over a
    token-array column named ``t`` — the single source of truth for
    language assignment (_predicted_lang and q_token_budget both
    compose it, so they cannot silently diverge). Returns a struct
    (h: best hit count, r: reverse-alphabet rank, lang: winner)."""
    langs = sorted({lang for lang, _ in T.LANG_LEXICON})
    structs = []
    for i, lang in enumerate(langs):
        words = ", ".join(f"'{w}'" for l2, w in T.LANG_LEXICON if l2 == lang)
        rev = len(langs) - 1 - i
        structs.append(
            f"named_struct('h', size(filter(t, x -> x IN ({words}))),"
            f" 'r', {rev}, 'lang', '{lang}')"
        )
    return f"array_max(array({', '.join(structs)}))"


def _predicted_lang(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, lang, hits): lexicon-hit argmax per document — shared
    by q_lang_id and q_token_budget so the language assignment cannot
    silently diverge between them.

    Round-13 rewrite (the former shape exploded EVERY corpus token
    through a broadcast join, one (doc, lang) exchange and an argmax
    window — token-scale map work + a shuffle + a window for a
    28-word lexicon): the per-language hit count is a per-row
    ``size(filter(tokens, x -> x IN (...)))`` expression and the
    argmax is ``array_max`` over (hits, rev_rank, lang) structs,
    whose lexicographic max IS 'hits DESC, lang ASC' (rev_rank
    reverses the alphabet so ties pick the alphabetically first
    language). Zero shuffles, zero joins, one scan; value-identical
    to the join+window form — langs absent from a doc have hit count
    0 and cannot win, and docs with no hits at all are dropped by
    the h > 0 filter exactly like the old inner join. Scales as pure
    map work; a lexicon too large for an IN-list would flip back to
    the broadcast-join form (the size_gated_broadcast convention).
    The argmax expression itself is single-sourced in
    ``_lang_argmax_sql`` — q_token_budget composes the IDENTICAL
    expression inline (its single-pass form), so the two consumers
    still cannot diverge."""
    return (
        docs.select("doc_id", T.tokens("text").alias("t"))
        .select("doc_id", F.expr(_lang_argmax_sql()).alias("b"))
        .where(F.col("b.h") > 0)
        .select(
            "doc_id",
            F.col("b.lang").alias("lang"),
            F.col("b.h").alias("hits"),
        )
    )


#: q_lang_id's DuckDB oracle, preserved after its round-7 registry
#: retirement (slot went to q_chunk_dedup) — the cross-engine value
#: check survives in tests/test_retired_parity.py.
SQL_LANG_ID = f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    lex(lang, word) AS (VALUES {_LEX_VALUES}),
    hits AS (
      SELECT t.doc_id, l.lang, count(*) AS hits
      FROM tok t JOIN lex l ON t.tok = l.word
      GROUP BY t.doc_id, l.lang),
    ranked AS (
      SELECT doc_id, lang, hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang ASC) AS rn
      FROM hits)
    SELECT doc_id, lang AS pred_lang, hits FROM ranked WHERE rn = 1
    """


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count stopword-lexicon hits per
    language, argmax per document (ties broken alphabetically).
    Per-row expressions end-to-end since round 13 (_predicted_lang /
    _lang_argmax_sql — zero shuffles, zero joins); value-identical
    to the former explode + broadcast-join + window form, which the
    SQL_LANG_ID oracle still expresses. N-gram extension slot
    documented in text.py.

    Round-7 registry retirement (cap is 50; slot went to
    q_chunk_dedup): q_token_budget composes the IDENTICAL
    ``_lang_argmax_sql`` expression — single-sourced, so the two
    consumers cannot diverge — as the language leg of its
    registered, hash-checked rollup, so the assignment stays
    oracle-verified through the witness every round (and this form
    itself cycles under the gate via the round-13 rotation). Full
    oracle comparison in tests/test_retired_parity.py against
    SQL_LANG_ID. Kept unregistered as the narrow-API form."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return _predicted_lang(spark, docs).select(
        "doc_id", F.col("lang").alias("pred_lang"), "hits"
    )


@register("q_quality_score", oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           CAST(len(list_intersect(toks, {_STOP_LIST_SQL})) AS DOUBLE)
             / greatest(len(list_distinct(toks)), 1) AS stop_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE)
             / greatest(len(toks), 1) AS type_token_ratio,
           least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score,
           0.4 * (CAST(len(list_intersect(toks, {_STOP_LIST_SQL})) AS DOUBLE)
                  / greatest(len(list_distinct(toks)), 1))
         + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                  / greatest(len(toks), 1))
         + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS quality_score
    FROM t
    """)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (Gopher/C4-style cheap filters):
    stopword presence ratio, type-token ratio (lexical diversity),
    length score; fixed-weight blend. Expression structure is kept
    IDENTICAL to the oracle so IEEE double arithmetic matches
    bit-for-bit. array_intersect/list_intersect both dedup — same
    semantics."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = T.quality_exprs("text")
    return docs.select(
        "doc_id",
        *[q[name].alias(name) for name in (
            "n_tokens", "stop_ratio", "type_token_ratio", "len_score",
            "quality_score",
        )],
    )


@register("q_token_budget", oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    lex(lang, word) AS (VALUES {_LEX_VALUES}),
    hits AS (
      SELECT t.doc_id, l.lang, count(*) AS hits
      FROM tok t JOIN lex l ON t.tok = l.word
      GROUP BY t.doc_id, l.lang),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang ASC) AS rn
      FROM hits),
    counts AS (
      SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens FROM documents)
    SELECT coalesce(r.lang, 'unknown') AS pred_lang,
           count(*) AS n_docs,
           CAST(sum(c.n_tokens) AS BIGINT) AS total_tokens
    FROM counts c LEFT JOIN ranked r ON r.doc_id = c.doc_id AND r.rn = 1
    GROUP BY coalesce(r.lang, 'unknown')
    """)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix accounting: token budget per predicted language
    (docs with no lexicon hit land in 'unknown'). Composition of the
    language-ID argmax and the per-row token count — the question
    every corpus build answers before fixing sampling rates.

    Single-pass since round 13: the argmax is the shared per-row
    ``_lang_argmax_sql`` expression (the same single-sourced unit
    _predicted_lang / q_lang_id serve), so the token count and the
    language ride ONE documents scan into a 5-group aggregate —
    no token explode, no lexicon join, no doc_id exchange. The only
    shuffle is 5 partial rows per task."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(T.tokens("text").alias("t"))
        .select(
            F.size("t").alias("n_tokens"),
            F.expr(_lang_argmax_sql()).alias("b"),
        )
        .groupBy(
            F.when(F.col("b.h") > 0, F.col("b.lang"))
            .otherwise(F.lit("unknown"))
            .alias("pred_lang")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


#: corpus-clean thresholds: keep docs with at least MIN_TOKENS tokens
#: and a quality score at or above the sf-wide median (~0.34)
CLEAN_MIN_TOKENS = 30
CLEAN_MIN_QUALITY = 0.33

_SQL_QUALITY = f"""
      SELECT doc_id, text,
             len(toks) AS n_tokens,
             0.4 * (CAST(len(list_intersect(toks, {_STOP_LIST_SQL})) AS DOUBLE)
                    / greatest(len(list_distinct(toks)), 1))
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                    / greatest(len(toks), 1))
           + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS quality_score
      FROM (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents) raw
"""


@register("q_corpus_clean", oracle=f"""
    WITH scored AS ({_SQL_QUALITY}),
    kept AS (
      SELECT doc_id, n_tokens, quality_score,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fingerprint
      FROM scored
      WHERE n_tokens >= {CLEAN_MIN_TOKENS}
        AND quality_score >= {CLEAN_MIN_QUALITY}),
    dedup AS (
      SELECT fingerprint, min(doc_id) AS keep_doc_id, count(*) AS n_copies
      FROM kept GROUP BY fingerprint)
    SELECT k.doc_id, k.fingerprint, k.n_tokens, k.quality_score, d.n_copies
    FROM kept k JOIN dedup d
      ON d.fingerprint = k.fingerprint AND d.keep_doc_id = k.doc_id
    """)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus cleaning pipeline in one plan:
    quality filter (q_quality_score's exact blend) -> canonical
    fingerprint (q_doc_fingerprint) -> exact dedup keeping the lowest
    doc_id per fingerprint. This is the composition a 100 TB corpus
    job runs before any near-dup machinery: per-row scoring and
    hashing, then one window over the uniform fingerprint. No
    pre-repartition: shuffling the raw text costs more than parallel
    tokenization saves at this size (measured; a real multi-split
    scan parallelizes the scoring anyway). Quality expression
    structure is kept identical to the oracle for bit-exact
    doubles."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = T.quality_exprs("text")
    kept = (
        docs.select(
            "doc_id",
            q["n_tokens"].alias("n_tokens"),
            q["quality_score"].alias("quality_score"),
            F.md5(T.normalized_text("text")).alias("fingerprint"),
        )
        .filter(
            (F.col("n_tokens") >= CLEAN_MIN_TOKENS)
            & (F.col("quality_score") >= CLEAN_MIN_QUALITY)
        )
    )
    # single traversal: copies-count and keep-first in one window over
    # the fingerprint (a groupBy + join-back would tokenize every row
    # twice — once per traversal of `kept`)
    w = Window.partitionBy("fingerprint")
    return (
        kept.withColumn("n_copies", F.count("*").over(w))
        .withColumn(
            "rn", F.row_number().over(w.orderBy(F.col("doc_id").asc()))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "n_tokens", "quality_score", "n_copies")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over whitespace/punctuation-normalized
    text: robust to formatting-only differences, the key for exact
    near-canonical dedup (md5 — portable across engines).

    Round-5 registry retirement (cap is 50; slot went to
    q_pack_sequences): the identical fingerprint expression is a
    hash-checked output column of q_corpus_clean (its `fingerprint`),
    which also exercises it as a join/window key. Kept unregistered
    as the narrow-API form."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return docs.select(
        "doc_id", F.md5(T.normalized_text("text")).alias("fingerprint")
    )


#: sequence-packing shape: contexts of CTX tokens, documents packed
#: per shard (shards are the unit a training job writes/reads
#: independently — and the reason the packing window never needs a
#: global single-partition sort)
PACK_CTX = 512
PACK_SHARDS = 8


@register("q_pack_sequences", oracle=f"""
    WITH t AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len({_SQL_TOKENS}) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             -- window sum of BIGINT is HUGEINT in DuckDB (-> float in
             -- pandas); cast back so both engines emit int64
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS BIGINT) AS tok_offset
      FROM t WHERE n_tokens > 0)
    SELECT doc_id, shard, n_tokens, tok_offset,
           tok_offset // {PACK_CTX} AS first_chunk,
           (tok_offset + n_tokens - 1) // {PACK_CTX} AS last_chunk,
           (tok_offset + n_tokens - 1) // {PACK_CTX}
             - tok_offset // {PACK_CTX} + 1 AS n_chunks
    FROM packed
    """)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk batching op every LLM
    pretraining pipeline runs: documents are tokenized, concatenated
    in a deterministic order, and split into fixed-{PACK_CTX}-token
    training contexts. The output maps each document to its byte...
    token offset and the [first_chunk, last_chunk] context range it
    lands in (a doc spanning a boundary straddles two contexts — the
    standard packing trade vs padding waste).

    Scale shape: packing is PER SHARD (doc_id % {PACK_SHARDS}) —
    shards are what a training job writes and reads independently, so
    the running-offset window partitions by shard and never needs a
    global single-partition sort; one shuffle on shard total, and the
    cumulative sum is the only stateful op (O(1) per row). Empty
    documents are dropped before packing (they occupy no tokens) so
    offsets stay contiguous in both engines."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(T.tokens("text")).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = t.withColumn(
        "tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    first = F.expr(f"tok_offset div {PACK_CTX}")
    last = F.expr(f"(tok_offset + n_tokens - 1) div {PACK_CTX}")
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + F.lit(1)).alias("n_chunks"),
    )


#: BPE geometry for the registered encode: enough merges that real
#: multi-character tokens win (the corpus vocabulary is ~40 words),
#: few enough that training is a sub-second driver loop at any sf
#: (the histogram, not the corpus, bounds the loop)
BPE_MERGES = 64
#: fitted-merge-table memo per (application, sf_dir) — the quantizer
#: convention (queries/similarity.py): a production tokenizer trains
#: once and encodes many corpora; refitting per query would
#: misrepresent the operator's cost
_BPE_CACHE: dict[tuple, list] = {}


#: PINNED merge table for the registered q_bpe_encode (round-16
#: verdict item 4: converting the gate from rows-only to
#: value-checked requires the oracle to know the merges, and
#: oracle_sql() strings are fixed at registration — so the gate
#: encodes under this committed constant instead of refitting per
#: corpus). Provenance: bpe.train_bpe over the sf0.001 documents
#: histogram at n_merges=64, deterministic (lexicographic
#: tie-break); regenerate with scripts shown in SURVEY.md round-16
#: log. Corpus-FITTED training stays exercised by tests/test_bpe.py
#: and the q_bpe_encode_fitted form below.
BPE_GATE_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('e', '</w>'), ('n', '</w>'), ('o', 'r'), ('t', '</w>'),
    ('er', '</w>'), ('o', 'w'), ('ow', '</w>'), ('l', 'u'), ('i', 'n'),
    ('y', '</w>'), ('a', 'r'), ('p', 'ar'), ('g', '</w>'), ('a', 's'),
    ('h', '</w>'), ('a', '</w>'), ('s', 't'), ('a', 't'), ('a', 'n</w>'),
    ('c', 'an</w>'), ('s', 'can</w>'), ('c', 'o'), ('co', 'lu'),
    ('colu', 'm'), ('colum', 'n</w>'), ('d', 'ow</w>'), ('in', 'dow</w>'),
    ('w', 'indow</w>'), ('d', 'er</w>'), ('or', 'der</w>'),
    ('or', 't</w>'), ('s', 'ort</w>'), ('p', '</w>'), ('par', 't</w>'),
    ('u', 'p</w>'), ('a', 'g'), ('ag', 'g</w>'), ('a', 'lu'),
    ('alu', 'e</w>'), ('v', 'alue</w>'), ('in', 'e</w>'), ('l', 'ine</w>'),
    ('e', 'y</w>'), ('k', 'ey</w>'), ('i', 'n</w>'), ('j', 'o'),
    ('jo', 'in</w>'), ('er', 'g'), ('erg', 'e</w>'), ('m', 'erge</w>'),
    ('er', 'y</w>'), ('g', 'r'), ('gr', 'o'), ('gro', 'up</w>'),
    ('q', 'u'), ('qu', 'ery</w>'), ('c', 't'), ('ct', 'or'),
    ('ctor', '</w>'), ('e', 'ctor</w>'), ('v', 'ector</w>'),
    ('as', 'h</w>'), ('h', 'ash</w>'),
]


def _sql_bpe_encode() -> str:
    """DuckDB replay of bpe.encode_word under BPE_GATE_MERGES, as a
    chain of separator-aware global regexp_replace rewrites.

    Equivalence to the greedy min-rank loop (proved by construction,
    re-verified on 3k random words in tests/test_bpe.py): (a) a rule
    that CONSUMES a merged token always ranks after the rule that
    created it (BPE learns rules over existing symbols), so applying
    rules once in ascending rank order equals repeatedly applying the
    lowest-ranked present pair; (b) within one rule, merging can
    never create a new occurrence of that same pair, and RE2's
    leftmost non-overlapping global replace IS the greedy
    one-at-a-time order for self-overlapping runs (a a a -> aa a).

    Wire format: symbols joined by '##' with '##' at both ends
    ('#' never occurs in a symbol: [a-z0-9] chars plus the '</w>'
    marker); merge (a, b) rewrites '#a##b#' -> '#ab#', consuming one
    '#' from each flank so the double-separator invariant holds.
    Tokens each contribute chars + '</w>', so no learned rule can
    cross a word boundary ('</w>' is terminal in training)."""
    sep_words = (
        "list_transform("
        "  regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'),"
        "  w -> array_to_string(regexp_extract_all(w, '.'), '##')"
        "       || '##</w>')"
    )
    expr = f"'##' || array_to_string({sep_words}, '##') || '##'"
    for a, b in BPE_GATE_MERGES:
        # symbols contain only [a-z0-9</w>] — no RE2 metacharacters
        expr = f"regexp_replace({expr}, '#{a}##{b}#', '#{a}{b}#', 'g')"
    return f"""
    WITH enc AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(coalesce(text, '')),
                 '[a-z0-9]+')) AS nw,
             {expr} AS s
      FROM documents)
    SELECT doc_id,
           CASE WHEN nw = 0 THEN 0
                ELSE length(s) - length(replace(s, '##', '#')) - 1
           END AS n_bpe_tokens,
           CASE WHEN nw = 0 THEN ''
                ELSE replace(trim(s, '#'), '##', ' ')
           END AS bpe_text
    FROM enc
    """


@register("q_bpe_encode", oracle=_sql_bpe_encode())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenization under the PINNED gate merge table
    (BPE_GATE_MERGES): shuffle-free Arrow-batched encoding of every
    document with the merge table riding the closure
    (bpe.bpe_encode). Output per document: token count and the
    space-joined token stream (arrays are serialized for the
    driver's canonicalizer).

    VALUE-CHECKED since round 16 (verdict item 4, the r13
    q_bm25_served conversion precedent): encoding under a fixed merge
    table is deterministic, so the DuckDB oracle replays the greedy
    encoder as a rank-ordered chain of separator-aware
    regexp_replace rewrites over the same merge constants
    (_sql_bpe_encode) — the real mapInPandas encoder vs an
    independent SQL reimplementation, hash-compared. Corpus-FITTED
    merge learning (histogram -> train_bpe) stays exercised through
    q_bpe_encode_fitted, bench, and tests/test_bpe.py.

    Scale shape: encoding is a pure map with a per-batch word cache —
    no shuffle, no per-row Python, Arrow batches in and out."""
    from clinical_data_warehouse_bi_spark import bpe

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    enc = bpe.bpe_encode(
        fan_out(docs.select("doc_id", "text")), BPE_GATE_MERGES
    )
    return enc.select(
        "doc_id",
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
    )


def q_bpe_encode_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-FITTED form (the registered entry through round
    15): ONE histogram job (bpe.word_histogram), the deterministic
    driver-side merge-learning loop (bpe.train_bpe — vocabulary-
    sized, not corpus-sized), then the same distributed encode.
    Unregistered since the round-16 value-check conversion pinned the
    gate's merges; kept for bench/scale probes and as the
    production-shaped API (train once, encode many corpora — the
    _BPE_CACHE memo)."""
    from clinical_data_warehouse_bi_spark import bpe

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ck = (spark.sparkContext.applicationId, sf_dir, BPE_MERGES)
    merges = _BPE_CACHE.get(ck)
    if merges is None:
        hist = [
            (r.word, r.n)
            for r in bpe.word_histogram(docs).orderBy("word").collect()
        ]
        merges = bpe.train_bpe(hist, n_merges=BPE_MERGES)
        _BPE_CACHE[ck] = merges
    enc = bpe.bpe_encode(fan_out(docs.select("doc_id", "text")), merges)
    return enc.select(
        "doc_id",
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
    )


#: per-source document cap for the registered quota demo (the corpus
#: has a handful of sources; 30 caps every one of them)
QUOTA_PER_SOURCE = 30


SQL_QUOTA_SAMPLE = f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= {QUOTA_PER_SOURCE}
    """


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (text.quota_sample) — the C4/RefinedWeb
    domain-capping step: keep at most {QUOTA_PER_SOURCE} documents
    per source, selected by a deterministic md5-of-id priority (the
    q_corpus_clean fingerprint convention: uniform,
    content-independent, and reproduced bit-for-bit by the DuckDB
    oracle's identical window).

    Round-10 registry retirement (cap is 50; the slot went to
    q_dp_release): hash-checked since round 8 on a frozen
    implementation. Witness: q_weighted_sample keeps the sampling
    family's md5-priority discipline under the hash gate, and the
    WindowGroupLimit pre-prune stays plan-locked in
    tests/test_plans.py. The full oracle comparison stays live in
    tests/test_retired_parity.py against SQL_QUOTA_SAMPLE;
    idempotence and cap properties remain hypothesis-tested.

    Scale shape: ONE shuffle on the source key, and the rank<=n
    predicate compiles to WindowGroupLimit so every map task
    pre-prunes to n rows per source BEFORE the exchange — a hot
    domain ships n rows per upstream partition, not its row set."""
    from clinical_data_warehouse_bi_spark.text import quota_sample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quota_sample(docs, "source", QUOTA_PER_SOURCE).select(
        "doc_id", "source"
    )


#: weighted-sample size for the registered query (small vs the
#: corpus so the weight signal actually selects)
WSAMPLE_K = 50


@register("q_weighted_sample", oracle=f"""
    SELECT doc_id, CAST((doc_id % 7) + 1 AS DOUBLE) AS w
    FROM (
      SELECT doc_id,
             pow((('0x' || substr(md5('ws0:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   + 1.0) / 4294967297.0,
                 1.0 / ((doc_id % 7) + 1.0)) AS pri
      FROM documents)
    ORDER BY pri DESC, doc_id ASC LIMIT {WSAMPLE_K}
    """)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (text.weighted_sample, Efraimidis-Spirakis A-ES priorities) —
    the quality-weighted subsampling step of a curated corpus mix.
    The weight is a synthetic (doc_id % 7) + 1 so every weight tier
    exists; the priority u^(1/w) draws u from a PORTABLE md5 of
    (seed, id), so the DuckDB oracle reproduces the exact sample —
    the same IEEE doubles, the same pow, the same top-k.

    Scale shape: priority is one per-row expression and selection is
    a TakeOrderedAndProject top-k — no shuffle, no RNG state, and
    the sample is layout-independent (Spark's rand() cannot promise
    that across partitionings). Registered per the round-8 verdict
    to move the sampling family's last pytest-only member under the
    driver's hash gate."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    weighted = docs.select(
        "doc_id", ((F.col("doc_id") % 7) + 1).cast("double").alias("w")
    )
    return T.weighted_sample(weighted, WSAMPLE_K, "w")


@register("q_boilerplate", oracle="""
    WITH staged AS (
      SELECT doc_id, source,
             'HEADER ' || source || chr(10) || replace(text, ' ', chr(10)) AS text
      FROM documents),
    t AS (
      SELECT doc_id, source, string_split(text, chr(10)) AS w FROM staged),
    lines AS (
      SELECT doc_id, source, i AS pos, w[i+1] AS s
      FROM t, unnest(generate_series(0, len(w) - 1)) AS u(i)
      WHERE length(trim(w[i+1])) > 0),
    per_line AS (
      SELECT source, s, count(DISTINCT doc_id) AS n_docs_with
      FROM lines GROUP BY source, s),
    per_src AS (
      SELECT source, count(*) AS n_docs FROM staged GROUP BY source),
    boiler AS (
      SELECT pl.source, pl.s
      FROM per_line pl JOIN per_src ps ON ps.source = pl.source
      WHERE ps.n_docs >= 3 AND pl.n_docs_with > 0.5 * ps.n_docs),
    kept AS (
      SELECT l.doc_id, l.pos, l.s
      FROM lines l
      LEFT JOIN boiler b ON b.source = l.source AND b.s = l.s
      WHERE b.s IS NULL),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(s, chr(10) ORDER BY pos) AS text
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT d.doc_id, d.source,
           coalesce(r.text, '') AS text,
           CAST(coalesce(t2.n_lines, 0) - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_removed_lines
    FROM staged d
    LEFT JOIN tot t2 ON t2.doc_id = d.doc_id
    LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    """)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate line removal (text.remove_boilerplate,
    the CCNet web-corpus cleaning step): a line appearing in more
    than half of a source's documents is header/footer furniture —
    strip it from every document of that source, preserving the
    order of the surviving lines. The synthetic corpus has no
    newlines, so the registered staging derives a multi-line text
    deterministically (a per-source 'HEADER <source>' line — true
    furniture, present in 100% of the source's docs — followed by
    the document's words one per line, so common words cross the
    50% threshold too); the DuckDB oracle recomputes the removal on
    the line STRINGS, verifying the salted-hash-pair shortcut
    value-for-value.

    Scale shape (plan-locked in tests/test_properties.py): line text
    never shuffles — lines leave the scan as salted xxhash64 pairs
    (md5 until round 17; same 128-bit identity budget, a fraction of
    the per-line CPU and 16 bytes per line through the counting
    exchange instead of 64 hex chars), the boilerplate relation is
    two slim per-source aggregations, and the rebuild is a per-row
    array filter against a broadcast per-source hash set. Registered
    per the round-8 verdict (q_boilerplate named a ready oracle
    candidate).

    fan_out keyed BY doc_id (round-17): doc_id is a member of the
    counting side's distinct key set (__id, __src, h1, h2), so the
    distinct aggregation rides the fan_out exchange instead of
    re-exchanging the exploded per-line hash rows (guide §2.4).
    A/B at sf0.1, identical output checksums: md5 + round-robin
    1.434 best / 1.589 median s -> xxhash pair 1.249/1.563 ->
    xxhash pair + keyed fan_out 1.232/1.266."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("HEADER "),
            F.col("source"),
            F.lit("\n"),
            F.regexp_replace("text", " ", "\n"),
        ).alias("text"),
    )
    return T.remove_boilerplate(
        fan_out(staged, "doc_id"), min_frac=0.5, min_docs=3
    )


# ---------------------------------------------------------------------------
# Corpus n-gram frequency diagnostic — text.top_ngrams under the gate
# ---------------------------------------------------------------------------

#: top-ngrams parameters (n-gram width, report size)
NGRAM_N = 3
NGRAM_K = 100


@register("q_top_ngrams", oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (
      SELECT doc_id, array_to_string(w[i:i+{NGRAM_N - 1}], ' ') AS ngram
      FROM t, unnest(generate_series(1, len(w) - {NGRAM_N - 1})) AS u(i)
      WHERE len(w) >= {NGRAM_N}),
    c AS (
      SELECT ngram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
      FROM g GROUP BY ngram)
    SELECT ngram, n_occ, n_docs
    FROM c ORDER BY n_occ DESC, ngram ASC LIMIT {NGRAM_K}
    """)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most-frequent token {NGRAM_N}-grams
    (text.top_ngrams) — the diagnostic that tunes the dedup family
    (which spans will remove_repeated_spans hit, which lines is
    remove_boilerplate about to strip, is the corpus templated).
    Deterministic total order (n_occ DESC, ngram ASC) LIMIT
    {NGRAM_K}.

    Scale shape (no-text-in-exchange applied to a frequency report):
    the corpus-sized counting aggregation exchanges only each
    window's salted xxhash64 PAIR; strings are re-derived map-side
    for the >=k-th-count candidates only and joined against the
    BROADCAST candidate counts. The oracle recomputes the report on
    the n-gram strings themselves, so the hash gate proves the
    salted-pair shortcut value-for-value (the q_repeated_spans
    construction)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return T.top_ngrams(fan_out(docs), n=NGRAM_N, k=NGRAM_K)


# ---------------------------------------------------------------------------
# Round-11 registrations (staged as named candidates in round 10,
# registered per the round-10 verdict items 2-3; slots freed by
# retiring q_resample_fill and q_readmission_gap — see their
# retirement notes in queries/windows.py).
# ---------------------------------------------------------------------------

#: split fractions for the staged split-assignment demo
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = "cdwbi-split-demo"

SQL_SPLIT_ASSIGN = f"""
    SELECT doc_id,
           CASE WHEN u <= 0.8 THEN 'train'
                WHEN u <= 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 (('0x' || substr(md5('{SPLIT_SEED}:'
                                      || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  + 1.0) / 4294967297.0 AS u
          FROM documents) t
    """


@register("q_split_assign", oracle=SQL_SPLIT_ASSIGN)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (text.split_assign):
    every document draws a portable md5-uniform and lands in the
    split whose cumulative-fraction interval contains it — stable
    under corpus growth and identical on any cluster layout (two
    promises Spark's rand() cannot make). The cluster-keyed
    leakage-safe form (text.cluster_safe_split) composes this with
    the q_dedup_clusters relation; the per-id form is the
    oracle-checkable witness.

    Scale shape: ONE per-row expression, no shuffle, no RNG state."""
    from clinical_data_warehouse_bi_spark.text import split_assign

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return split_assign(
        docs.select("doc_id"), SPLIT_FRACTIONS, seed=SPLIT_SEED
    ).select("doc_id", "split")


#: repeat-upsample demo mix: a published-recipe-shaped factor table —
#: heavy repeat, light repeat, fractional downsample; everything else
#: passes through once
UPSAMPLE_SEED = "up0"
UPSAMPLE_FACTORS = {"src0": 3.2, "src1": 2.0, "src2": 0.4}

SQL_REPEAT_UPSAMPLE = f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 3.2
                         WHEN 'src1' THEN 2.0
                         WHEN 'src2' THEN 0.4
                         ELSE 1.0 END AS f,
             (('0x' || substr(md5('{UPSAMPLE_SEED}:'
                                  || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 1.0) / 4294967297.0 AS u
      FROM documents),
    r AS (
      SELECT doc_id, source,
             CAST(floor(f)
                  + CASE WHEN u < f - floor(f) THEN 1 ELSE 0 END
                  AS BIGINT) AS n
      FROM w)
    SELECT doc_id, source, CAST(g.copy_idx AS BIGINT) AS copy_idx
    FROM r, LATERAL (SELECT unnest(generate_series(1, r.n)) AS copy_idx) g
    WHERE r.n >= 1
    """


@register("q_repeat_upsample", oracle=SQL_REPEAT_UPSAMPLE)
def q_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling (text.repeat_upsample):
    the published-data-mix repeat table — each source's rows emit
    floor(f) copies plus one more iff the row's portable md5-uniform
    lands under frac(f), so expected multiplicity equals the factor
    exactly and the realized copy count is a pure function of
    (seed, doc_id): stable across runs and layouts where rand()-
    Bernoulli rounding is neither. copy_idx = 1..n is the training
    loader's repeat index.

    Scale shape: one per-row CASE + a guarded generated-sequence
    explode — map-side fan-out only, NO shuffle, no RNG state."""
    from clinical_data_warehouse_bi_spark.text import repeat_upsample

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return repeat_upsample(
        docs.select("doc_id", "source"),
        UPSAMPLE_FACTORS,
        seed=UPSAMPLE_SEED,
    ).select("doc_id", "source", "copy_idx")


#: epoch-shuffle demo knobs: seed selects the permutation, shard
#: size cuts the permuted order into training shards
EPOCH_SEED = 7
EPOCH_SHARD_DOCS = 500

SQL_EPOCH_SHUFFLE = f"""
    SELECT doc_id, epoch_pos,
           CAST(floor((epoch_pos - 1) / {EPOCH_SHARD_DOCS}) AS BIGINT)
             AS shard_id
    FROM (SELECT doc_id,
                 row_number() OVER (
                   ORDER BY md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS epoch_pos
          FROM documents) t
    """


@register("q_epoch_shuffle", oracle=SQL_EPOCH_SHUFFLE)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment
    (text.epoch_shuffle): every document takes a dense global
    position 1..N in seeded-md5 order — the per-epoch permutation a
    training pipeline applies before writing shard files, portable
    and layout-independent where orderBy(rand()) is neither, and a
    different permutation per seed for multi-epoch training.

    Scale shape: NO global window — the hash range-partitions the
    corpus, partitions sort locally, and the dense position comes
    from keys.zip_index_key's offset-cumsum (one tiny stats job);
    output ranks are range-boundary-independent by construction.
    The oracle's single-partition ROW_NUMBER is the semantic twin,
    not the plan."""
    from clinical_data_warehouse_bi_spark.text import epoch_shuffle

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = epoch_shuffle(docs.select("doc_id"), seed=EPOCH_SEED)
    return out.select(
        "doc_id",
        "epoch_pos",
        F.floor((F.col("epoch_pos") - 1) / EPOCH_SHARD_DOCS)
        .cast("bigint")
        .alias("shard_id"),
    )


#: vocabulary-divergence report size for the staged demo
VOCAB_DIV_K = 50

SQL_VOCAB_DIVERGENCE = f"""
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
      SELECT token,
             (CASE WHEN n_a > 0 THEN (n_a/sa) * log2((n_a/sa) /
                    ((n_a/sa + n_b/sb) / 2.0)) ELSE 0 END
            + CASE WHEN n_b > 0 THEN (n_b/sb) * log2((n_b/sb) /
                    ((n_a/sa + n_b/sb) / 2.0)) ELSE 0 END) / 2.0
               AS js
      FROM j, tots)
    SELECT token,
           CAST(CAST(js AS DECIMAL(28,12)) AS VARCHAR) AS js_contrib_q
    FROM terms
    ORDER BY js DESC, token ASC LIMIT {VOCAB_DIV_K}
    """


@register("q_vocabulary_divergence", oracle=SQL_VOCAB_DIVERGENCE)
def q_vocabulary_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary drift (text.vocabulary_divergence): the
    top-{VOCAB_DIV_K} per-token Jensen-Shannon contributions between
    the even- and odd-id halves of the documents table (the
    snapshot-pair stand-in). js quantized decimal(28,12)->string on
    both sides — the cross-engine float convention; full-precision
    parity to 1e-12 lives in tests/test_properties.py.

    Scale shape: two slim (token, count) exchanges, one full outer
    join, per-row JS arithmetic, TakeOrdered top-k; totals ride as
    1-row broadcasts."""
    from clinical_data_warehouse_bi_spark.text import vocabulary_divergence

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = vocabulary_divergence(
        docs.filter("doc_id % 2 = 0"),
        docs.filter("doc_id % 2 = 1"),
        top_k=VOCAB_DIV_K,
    )
    return out.select(
        "token",
        F.col("js_contrib").cast("decimal(28,12)").cast("string")
        .alias("js_contrib_q"),
    )


# ---------------------------------------------------------------------------
# Round-12 registration: per-document TF-IDF keyword extraction.
# Slot freed by retiring q_simhash_pairs (witnesses in its
# docstring, queries/dedup.py). The full oracle comparison also
# stays in tests/test_retired_parity.py (sf0.01 + sf0.1 sweep).
# ---------------------------------------------------------------------------

#: keywords per document for the staged demo
TFIDF_K = 5

SQL_TFIDF_KEYWORDS = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df, score, rnk
    FROM ranked WHERE rnk <= {TFIDF_K}
    """


@register("q_tfidf_keywords", oracle=SQL_TFIDF_KEYWORDS)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{TFIDF_K} TF-IDF keywords
    (text.tfidf_keywords) — keyword extraction / document labeling,
    the corpus-browser and weak-supervision-tagging primitive the
    text family was missing (q_top_ngrams reports corpus-global
    phrases; this ranks terms PER DOCUMENT against the corpus).
    Deterministic per-doc total order (score DESC, term ASC); score
    is the retrieval.py ln convention (round to 4 decimals in both
    engines — ln is not correctly-rounded IEEE, the rounded value is
    the contract; same hazard budget q_bm25_topk has carried green
    since round 6).

    Scale shape: see text.tfidf_keywords — three slim exchanges
    (distinct (doc, term) tf pairs with map-side combine; the
    vocabulary-sized df count; the per-doc top-k window at
    output-candidate granularity), idf broadcast back per the lm.py
    model pattern, N as a 1-row broadcast. Raw text never enters an
    exchange.

    fan_out keyed BY doc_id (round-16): hash partitioning on doc_id
    is a subset of the tf aggregation's (doc_id, term) keys and
    exactly the top-k window's partition key, so both ride the
    fan_out exchange instead of adding their own (measured 7.45 ->
    4.07 s best-of-3 alternating at sf0.1 with the size-gate
    re-probed; identical rows).

    The document count N feeds from the RAW scan (round-17
    ``count_docs``): a count needs no rebalance, so the count
    subtree stops paying the fan_out's full-relation doc_id
    exchange (one fewer Exchange; 0.913 -> 0.666 s best / 0.951 ->
    0.809 median alternating A/B at sf0.1, identical rows)."""
    raw = load_tables(spark, sf_dir, ("documents",))["documents"]
    return T.tfidf_keywords(
        fan_out(raw, "doc_id"), k=TFIDF_K, count_docs=raw
    )
