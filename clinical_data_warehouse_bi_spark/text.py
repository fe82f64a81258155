"""Text-analysis / dedup building blocks for the training-data
pipeline extensions (BASELINE.json north star): normalization,
tokenization, word-shingling, MinHash signatures, SimHash.

Everything is built from JVM-side built-in functions (no Python UDFs)
so the hot path stays inside whole-stage codegen, and every hash is
md5- or arithmetic-based so the DuckDB oracle can reproduce it
bit-for-bit (Spark's hash()/xxhash64() and DuckDB's hash() are
different algorithms — never use them in compared output).

Scale notes: shingle explode multiplies rows by ~tokens-per-doc; the
minhash groupBy keys on (doc_id, seed) which is uniformly distributed
by construction — no skew. Band-bucket self-join is the standard
LSH candidate generation: join key (band_id, signature) keeps the
pair blow-up bounded by true near-duplicate clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default MinHash configuration: 16 hashes in 4 bands of 4 rows
MINHASH_SEEDS = 16
MINHASH_BANDS = 4

#: small stopword lexicon for language ID / quality scoring (shared
#: verbatim with the DuckDB oracles — keep sorted, lowercase)
LANG_LEXICON: list[tuple[str, str]] = [
    ("en", "the"), ("en", "and"), ("en", "of"), ("en", "to"), ("en", "in"),
    ("en", "is"), ("en", "a"),
    ("es", "el"), ("es", "la"), ("es", "de"), ("es", "que"), ("es", "y"),
    ("es", "los"), ("es", "es"),
    ("de", "der"), ("de", "die"), ("de", "das"), ("de", "und"), ("de", "ist"),
    ("de", "von"), ("de", "mit"),
    ("fr", "le"), ("fr", "les"), ("fr", "et"), ("fr", "des"), ("fr", "un"),
    ("fr", "une"), ("fr", "est"),
]

EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "a", "for", "on", "with"]


def normalized_text(col: Column | str) -> Column:
    """lowercase, collapse every non-alphanumeric run to one space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(col: Column | str) -> Column:
    """array of lowercase alphanumeric tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.expr(f"regexp_extract_all(lower({_name(col, c)}), '[a-z0-9]+', 0)")


def _name(col, c: Column) -> str:
    if isinstance(col, str):
        return col
    raise ValueError("tokens() requires a column name (used inside expr)")


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """n-word shingles: positions 1..len-n+1 of the token array
    (empty array when the doc is shorter than n)."""
    parts = lambda i: [F.element_at(tok_col, i + off) for off in range(n)]  # noqa: E731
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(" ", *parts(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingled(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             shingle_n: int = 3) -> DataFrame:
    """(doc_id, sh): exploded word shingles.

    fan_out first: the explode and the k-per-shingle hashing pipelined
    on top of it are the dedup pipeline's hot loop — they must run on
    every core, not on however few splits the input file happens to
    have (no-op on a well-split cluster read). Keyed on doc_id so the
    downstream per-doc aggregations (minhash min(), shingle-set
    distinct) inherit the partitioning and need no further exchange."""
    from clinical_data_warehouse_bi_spark.io import fan_out

    return fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(text_col), shingle_n)).alias("sh"),
    )


def minhash_wide(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_seeds: int = MINHASH_SEEDS,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, mh0..mh{k-1}): all k minhashes in ONE aggregation —
    k min() columns over the exploded shingles, one shuffle total.
    (The naive shape — explode x seeds then groupBy(doc, seed) —
    multiplies the shuffle k-fold for no reason; this one holds at
    100 TB: map-side partial min per column, tiny reduce.)"""
    sh = shingled(docs, id_col, text_col, shingle_n)
    # one parsed SQL string per column: k Column-object towers cost
    # ~4 py4j round-trips each in plan-build time, a string costs one
    return sh.groupBy("doc_id").agg(
        *[
            F.expr(f"min(md5(concat('{i}:', sh)))").alias(f"mh{i}")
            for i in range(num_seeds)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_seeds: int = MINHASH_SEEDS,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, seed, minhash): minhash = min over the doc's shingles
    of md5(seed || ':' || shingle). Lexicographic min over md5 hex is
    a valid uniform MinHash family and is engine-portable. Computed
    via minhash_wide + a shuffle-free stack() unpivot."""
    wide = minhash_wide(docs, id_col, text_col, num_seeds, shingle_n)
    stack_args = ", ".join(f"{i}, mh{i}" for i in range(num_seeds))
    return wide.select(
        "doc_id",
        F.expr(f"stack({num_seeds}, {stack_args}) AS (seed, minhash)"),
    ).select("doc_id", F.col("seed").cast("int"), "minhash")


def lsh_band_signatures_wide(
    wide: DataFrame, num_seeds: int = MINHASH_SEEDS, bands: int = MINHASH_BANDS
) -> DataFrame:
    """(doc_id, band_id, band_sig) from the wide signature matrix:
    band_sig = md5 of the band's minhashes joined in seed order —
    pure projection + unpivot, no shuffle."""
    rows = num_seeds // bands
    exprs = []
    for b in range(bands):
        cols = ", ".join(f"mh{b * rows + r}" for r in range(rows))
        exprs.append(f"{b}, md5(concat_ws('|', {cols}))")
    return wide.select(
        "doc_id",
        F.expr(f"stack({bands}, {', '.join(exprs)}) AS (band_id, band_sig)"),
    ).select("doc_id", F.col("band_id").cast("int"), "band_sig")


def lsh_band_signatures(minhash: DataFrame, bands: int = MINHASH_BANDS) -> DataFrame:
    """(doc_id, band_id, band_sig) from the UNPIVOTED signature
    matrix (kept for API parity; prefer lsh_band_signatures_wide)."""
    banded = minhash.withColumn(
        "band_id", F.floor(F.col("seed") / F.lit(MINHASH_SEEDS // bands)).cast("int")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda x: x["minhash"]
    )
    return banded.groupBy("doc_id", "band_id").agg(
        F.md5(F.array_join(ordered, "|")).alias("band_sig")
    )


def lsh_candidate_pairs(band_sigs: DataFrame) -> DataFrame:
    """distinct (doc_a < doc_b) sharing at least one band signature.

    The input is cached first: a self-join otherwise re-derives the
    entire upstream minhash DAG for BOTH sides. band_sigs is tiny
    (docs x bands rows of hashes) — at 100 TB it is still ~GBs and
    cache-able; if not, materialize it to parquet instead. cache (not
    localCheckpoint) deliberately: plan-matching lets repeated
    invocations in one session reuse the materialization; sessions
    running many unrelated queries should clearCache between them
    (bench.py does)."""
    band_sigs = band_sigs.cache()
    a = band_sigs.select(
        F.col("doc_id").alias("doc_a"), "band_id", F.col("band_sig").alias("sig_a")
    )
    b = band_sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("band_id").alias("band_id_b"),
        F.col("band_sig").alias("sig_b"),
    )
    return (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def chunk_manifest(packed: DataFrame, ctx: int) -> DataFrame:
    """Explode a sequence-packing relation (the shape
    queries/text_ops.py::q_pack_sequences emits: doc_id, shard,
    n_tokens, tok_offset, first_chunk, last_chunk) into the per-chunk
    manifest a training data-loader actually consumes: one row per
    (shard, chunk_id, doc_id) with the token slice [tok_start,
    tok_end) of the document that lands in that chunk. Every chunk is
    exactly ``ctx`` tokens except each shard's tail chunk
    (property-tested).

    Scale shape: sequence() + explode fans each document out to its
    n_chunks rows — bounded by ceil(n_tokens/ctx), so the explode is
    proportional to corpus token count / ctx, never quadratic; no
    shuffle is introduced (chunk ids are already shard-local)."""
    c = F.lit(ctx)
    chunk = F.col("chunk_id")
    lo = F.greatest(chunk * c, F.col("tok_offset"))
    hi = F.least((chunk + 1) * c, F.col("tok_offset") + F.col("n_tokens"))
    return (
        packed.select(
            "shard",
            "doc_id",
            "tok_offset",
            "n_tokens",
            F.explode(
                F.sequence(F.col("first_chunk"), F.col("last_chunk"))
            ).alias("chunk_id"),
        )
        .select(
            "shard",
            "chunk_id",
            "doc_id",
            (lo - F.col("tok_offset")).alias("tok_start"),
            (hi - F.col("tok_offset")).alias("tok_end"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Sub-document exact dedup with reconstruction (q_chunk_dedup's
    core, reusable over any (id, text) frame — including its own
    output, which makes the operator idempotent by construction):
    split into non-overlapping ``chunk_tokens``-token chunks, keep the
    globally first occurrence of each distinct chunk (order: id, then
    position), rebuild each document from its surviving chunks.

    Returns (id, n_chunks, n_kept, clean_text). Text never shuffles:
    the keep-first window runs on a slim (id, pos, h1, h2) relation —
    two independently-salted xxhash64s of the chunk, 128 bits total —
    and reconstruction joins the kept positions back to a
    re-tokenized scan (re-splitting is cheaper than shuffling or
    caching raw text; the q_corpus_clean measurement). NOTE: xxhash64
    is engine-specific — the registered query's DuckDB oracle dedups
    on chunk STRINGS instead, which is what verifies this shortcut.
    """
    from pyspark.sql import Window

    c = int(chunk_tokens)
    toks = docs.select(F.col(id_col).alias("__id"), tokens(text_col).alias("w"))
    n_chunks = F.expr(f"cast((size(w) + {c - 1}) div {c} as bigint)")
    hash_pairs = F.expr(
        f"transform("
        f"  transform(sequence(0, cast((size(w) + {c - 1}) div {c} as int) - 1),"
        f"            i -> concat_ws(' ', slice(w, i*{c}+1, {c}))),"
        f"  s -> struct(xxhash64(s) as h1, xxhash64(s, 'b') as h2))"
    )
    chunked = (
        toks.filter(F.size("w") > 0)
        .select("__id", F.posexplode(hash_pairs).alias("pos", "hp"))
        .select("__id", "pos", F.col("hp.h1").alias("h1"), F.col("hp.h2").alias("h2"))
    )
    w_keep = Window.partitionBy("h1", "h2").orderBy("__id", "pos")
    kept = (
        chunked.withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .groupBy("__id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("kept_pos"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
    )
    rebuild = F.expr(
        f"array_join(flatten(transform(kept_pos,"
        f" i -> slice(w, i*{c}+1, {c}))), ' ')"
    )
    return (
        toks.join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            n_chunks.alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.when(F.col("kept_pos").isNull(), F.lit(""))
            .otherwise(rebuild)
            .alias("clean_text"),
        )
    )


def lsh_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The persistable LSH index relation (doc_id, band_id, band_sig)
    for a corpus. Build ONCE, write with io.write_training_shards (or
    write_bucketed_table bucketed on band_sig for an exchange-free
    probe join); incremental batches then probe the stored index —
    corpus text is never re-read, re-tokenized, or re-hashed."""
    return lsh_band_signatures_wide(minhash_wide(docs, id_col, text_col))


def incremental_near_dup_pairs(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidates for an INCOMING batch without touching the
    existing corpus: band the batch (work proportional to the batch,
    not the corpus), then (a) join batch bands against the stored
    corpus index -> (corpus_id, batch_id) candidates and (b) self-join
    the batch bands -> within-batch candidates. This is how a corpus
    that ingests daily actually runs dedup at 100 TB — the full
    re-band of the union (q_minhash_lsh_pairs' shape) is the
    from-scratch build, THIS is the steady state.

    Returns distinct (doc_a, doc_b, origin) with origin
    'corpus-batch' (doc_a from the index) or 'batch' (doc_a < doc_b,
    both new). Exact-verification stays candidates-only downstream:
    semi-join candidate ids against the corpus to re-read just those
    documents (see incremental_verify_jaccard).

    Corpus and batch id spaces MUST be disjoint (any real ingest
    assigns new ids); pair orientation relies on it."""
    new_bands = lsh_index(batch, id_col, text_col).cache()
    idx = index.select(
        F.col("doc_id").alias("doc_a"),
        F.col("band_id").alias("band_id_i"),
        F.col("band_sig").alias("sig_i"),
    )
    nb = new_bands.select(
        F.col("doc_id").alias("doc_b"), "band_id", F.col("band_sig").alias("sig_b")
    )
    corpus_batch = (
        idx.join(
            nb,
            (F.col("band_id_i") == F.col("band_id"))
            & (F.col("sig_i") == F.col("sig_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("origin", F.lit("corpus-batch"))
    )
    batch_batch = lsh_candidate_pairs(new_bands).withColumn(
        "origin", F.lit("batch")
    )
    return corpus_batch.unionByName(batch_batch)


def incremental_verify_jaccard(
    pairs: DataFrame,
    corpus_docs: DataFrame,
    batch_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact 3-gram Jaccard on incremental candidates ONLY: the
    corpus side is semi-joined down to candidate ids BEFORE any
    shingling, so the expensive re-tokenization touches O(candidates)
    corpus documents, never the corpus (predicate pushdown carries
    the id filter into the corpus scan). Returns
    (doc_a, doc_b, origin, jaccard)."""
    pairs = pairs.cache()
    a_ids = pairs.select(F.col("doc_a").alias(id_col)).distinct()
    b_ids = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    touched = (
        corpus_docs.select(id_col, text_col)
        .join(a_ids, id_col, "left_semi")
        .unionByName(batch_docs.select(id_col, text_col))
        .join(a_ids.unionByName(b_ids).distinct(), id_col, "left_semi")
    )
    sh = shingled(touched, id_col, text_col, shingle_n).distinct().cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = (
        pairs.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("b_id")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b", "origin")
        .agg(F.count("*").alias("inter_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "origin",
            (
                F.col("inter_n").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter_n")).cast("double")
            ).alias("jaccard"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Paragraph/line-level exact dedup with reconstruction — the
    boundary-based sibling of chunk_dedup and the form newline
    corpora actually run (Dolma/RefinedWeb drop repeated paragraphs
    corpus-wide, keeping the first occurrence): split on ``delim``,
    drop whitespace-only units, keep the globally first occurrence of
    each distinct unit (order: id, then position), rebuild each
    document from its survivors joined by ``delim``.

    Returns (id, n_paras, n_kept, clean_text). Same scale shape as
    chunk_dedup: unit text is hashed to two salted 64-bit values in
    the scan's map stage, only (id, pos, h1, h2) ever shuffles, and
    reconstruction joins kept positions back to a re-split scan.
    Idempotent by construction (units are delimiter-bounded, so
    re-splitting the rebuilt text reproduces exactly the kept units).
    """
    import re as _re

    from pyspark.sql import Window

    # two escapings for the two roles the delimiter plays: F.split
    # treats its pattern as a Java REGEX (a '.' or '|' delimiter
    # would split per-character unescaped), while the array_join
    # rebuild embeds it as a SQL STRING literal
    split_pat = _re.escape(delim)
    d_lit = delim.replace("\\", "\\\\").replace("'", "\\'")
    parts = docs.select(
        F.col(id_col).alias("__id"), F.split(text_col, split_pat).alias("u")
    )
    hashed = (
        parts.select("__id", F.posexplode("u").alias("pos", "s"))
        .filter(F.trim("s") != "")
        .select(
            "__id",
            "pos",
            F.xxhash64("s").alias("h1"),
            F.xxhash64("s", F.lit("b")).alias("h2"),
        )
    )
    w_keep = Window.partitionBy("h1", "h2").orderBy("__id", "pos")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .groupBy("__id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("kept_pos"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
    )
    n_paras = F.expr("cast(size(filter(u, s -> trim(s) != '')) as bigint)")
    rebuild = F.expr(
        f"array_join(transform(kept_pos, i -> element_at(u, i + 1)), '{d_lit}')"
    )
    return (
        parts.join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            n_paras.alias("n_paras"),
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.when(F.col("kept_pos").isNull(), F.lit(""))
            .otherwise(rebuild)
            .alias("clean_text"),
        )
    )


def quota_sample(
    docs: DataFrame,
    group_col: str = "source",
    n_per_group: int = 100,
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Per-group quota cap: keep at most ``n_per_group`` documents
    per ``group_col`` value — the domain-capping step a corpus mix
    runs so no single source (one crawl domain, one dump) dominates
    the training distribution (the per-domain caps in C4/RefinedWeb;
    the COMPLEMENT of io.mix_sources, which reweights between whole
    sources after each is capped).

    Selection is deterministic and unbiased WITHIN a group: priority
    is the md5 of the document id (a uniform content-independent
    ranking both engines reproduce — the q_corpus_clean fingerprint
    convention), unless ``priority_col`` names a quality score to
    keep the BEST n instead (descending, id-tiebroken).

    Scale shape: ONE shuffle on the group key. The rank<=n predicate
    compiles to WindowGroupLimit (plan-tested), so every map task
    pre-prunes its partition to n rows per group BEFORE the
    exchange — a hot domain ships n rows per upstream partition, not
    its whole row set, which is what makes a quota cap survive the
    one-giant-domain skew case at 100 TB."""
    from pyspark.sql import Window

    if priority_col is None:
        order = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    else:
        order = [F.col(priority_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n_per_group))
        .drop("__rn")
    )


def cdc_chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_window: int = 3,
    divisor: int = 8,
) -> DataFrame:
    """Sub-document dedup with CONTENT-DEFINED chunk boundaries (the
    Rabin/CDC idea from dedup storage systems, token-level): a chunk
    boundary falls after token i iff the rolling hash of the last
    ``hash_window`` tokens is 0 mod ``divisor`` (expected chunk
    length ~= divisor tokens). Because a boundary depends only on the
    trailing token window, INSERTING text shifts every fixed-window
    chunk after the edit but leaves CDC boundaries downstream intact
    — shared suffixes still dedup, the exact failure mode of
    chunk_dedup's fixed windows (and the reason storage dedup
    abandoned fixed blocks).

    Same scale shape as chunk_dedup: boundaries, chunks and their two
    salted xxhash64s are all per-row array expressions; only the slim
    (id, chunk_idx, h1, h2) relation reaches the keep-first window,
    and reconstruction joins kept chunk indexes back to a re-chunked
    scan. Text never shuffles. Returns (id, n_chunks, n_kept,
    clean_text)."""
    from pyspark.sql import Window

    k, d = int(hash_window), int(divisor)
    toks = docs.select(F.col(id_col).alias("__id"), tokens(text_col).alias("w"))
    # boundary hash is PORTABLE md5 (int of the first 8 hex chars) so
    # the DuckDB oracle can recompute the same cuts — xxhash64 is
    # engine-specific and stays confined to the chunk-identity pairs
    # below, which the oracle verifies by deduping chunk STRINGS
    cuts = F.expr(
        f"filter(sequence(1, size(w) - 1),"
        f" i -> pmod(cast(conv(substring(md5(concat_ws(' ',"
        f"   slice(w, greatest(1, i - {k} + 1), least({k}, i)))), 1, 8),"
        f"   16, 10) as bigint), {d}) = 0)"
    )
    chunks = F.expr(
        "zip_with("
        "  concat(array(1), transform(__cuts, c -> c + 1)),"
        "  concat(__cuts, array(size(w))),"
        "  (s, e) -> concat_ws(' ', slice(w, s, e - s + 1)))"
    )
    chunked_docs = (
        toks.filter(F.size("w") > 0)
        .withColumn("__cuts", cuts)
        .withColumn("__chunks", chunks)
    )
    hash_pairs = F.expr(
        "transform(__chunks, s -> struct(xxhash64(s) as h1, xxhash64(s, 'b') as h2))"
    )
    slim = chunked_docs.select(
        "__id", F.posexplode(hash_pairs).alias("pos", "hp")
    ).select("__id", "pos", F.col("hp.h1").alias("h1"), F.col("hp.h2").alias("h2"))
    w_keep = Window.partitionBy("h1", "h2").orderBy("__id", "pos")
    kept = (
        slim.withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .groupBy("__id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("kept_pos"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
    )
    rebuild = F.expr("array_join(transform(kept_pos, p -> __chunks[p]), ' ')")
    nonempty = chunked_docs.join(kept, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.size("__chunks").cast("bigint").alias("n_chunks"),
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
        F.when(F.col("kept_pos").isNull(), F.lit(""))
        .otherwise(rebuild)
        .alias("clean_text"),
    )
    # token-less docs contribute fixed literals — a union, never a
    # join (joining the chunk-bearing relation back to the full doc
    # set invites a corpus-sized broadcast of chunk text)
    empty = toks.filter(F.size("w") == 0).select(
        F.col("__id").alias(id_col),
        F.lit(0).cast("bigint").alias("n_chunks"),
        F.lit(0).cast("bigint").alias("n_kept"),
        F.lit("").alias("clean_text"),
    )
    return nonempty.unionByName(empty)


def normalize_unicode(
    docs: DataFrame,
    text_col: str = "text",
    *,
    form: str = "NFKC",
    strip_accents: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column (NFKC by default: ligatures,
    fullwidth forms, and compatibility characters fold to canonical
    ASCII-ish equivalents; optionally strip combining marks so
    accented letters match their base forms) — the standard first
    step of multilingual corpus prep, before any tokenizer sees the
    bytes.

    Spark SQL has no unicode-normalization builtin, so this is an
    Arrow-batched mapInPandas pass (pure map: no shuffle, schema
    preserved with text replaced in place). Idempotent: normal forms
    are fixpoints, and mark-stripping removes what a second pass
    would no longer find."""
    import unicodedata

    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normal form: {form}")
    schema = docs.schema

    def _norm(s):
        if s is None:
            return None
        out = unicodedata.normalize(form, s)
        if strip_accents:
            out = "".join(
                ch
                for ch in unicodedata.normalize("NFD", out)
                if not unicodedata.combining(ch)
            )
            out = unicodedata.normalize(form, out)
        return out

    def op(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = pd.Series(
                [_norm(s) for s in pdf[text_col]], index=pdf.index, dtype=object
            )
            yield pdf

    return docs.mapInPandas(op, schema)


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws0",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES priority sampling): each row draws a
    reproducible uniform u from a PORTABLE md5 of (seed, id) and
    gets priority u^(1/w); the k highest priorities are the sample —
    inclusion probability proportional to weight, exactly the
    quality-weighted subsampling a curated corpus mix runs (keep
    better docs more often, never deterministically).

    Scale shape: priority is one per-row expression; selection is a
    TakeOrderedAndProject top-k — no shuffle, no RNG state, and the
    same (seed, id, weight) always reproduces the same sample on any
    cluster layout (Spark's rand() cannot promise that across
    partitionings). Rows with weight <= 0 are excluded; ties at the
    k boundary break by id. The md5-derived uniform and the pow are
    IEEE doubles, so a DuckDB twin reproduces the sample exactly
    (value-checked in tests)."""
    if k <= 0:
        raise ValueError("k must be positive")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)  # (h+1)/(2^32+1): u in (0, 1], never 0
    pri = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        docs.where(F.col(weight_col) > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )


def repeat_upsample(
    docs: DataFrame,
    factors: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "up0",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling by source — the data-mix
    repeat factors public LLM recipes publish (e.g. "wiki x 3.2,
    web x 0.8"): every row emits floor(f) copies plus one more iff
    its portable md5-uniform falls under frac(f), so each source's
    expected multiplicity is exactly its factor and the realized
    copy COUNT per row is a pure function of (seed, id) — stable
    across runs, cluster layouts, and corpus growth, where
    rand()-based Bernoulli rounding is none of those. Output rows
    carry ``out_col`` = 1..n (the training loader's copy index).
    Factors < 1 downsample by the same rule (0 copies when the
    uniform lands above f); sources absent from ``factors`` keep
    factor 1.0 (pass through once).

    Scale shape: one per-row CASE + a generated-sequence explode —
    map-side fan-out only, NO shuffle, no RNG state; the sequence is
    guarded (CASE WHEN n >= 1) because Spark's sequence(1, 0)
    DESCENDS instead of returning empty."""
    if any(f < 0 for f in factors.values()):
        raise ValueError("repeat factors must be >= 0")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    f = F.lit(1.0)
    for name, fac in factors.items():
        f = F.when(F.col(source_col) == name, F.lit(float(fac))).otherwise(f)
    n = (F.floor(f) + F.when(u < f - F.floor(f), F.lit(1)).otherwise(F.lit(0))).cast(
        "bigint"
    )
    return (
        docs.withColumn("__n", n)
        .where(F.col("__n") >= 1)
        .withColumn(
            out_col,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__n"))),
        )
        .drop("__n")
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    id_col: str = "doc_id",
    pos_col: str = "epoch_pos",
    n_ranges: int = 64,
) -> DataFrame:
    """Deterministic training-epoch permutation: every row receives a
    dense global position 1..N in the order of a seeded md5 over its
    id — the epoch shuffle a training-data pipeline runs before
    cutting each epoch into shards. Same promises as split_assign
    (portable, cluster-layout-independent, stable per (seed, id),
    a DIFFERENT permutation per seed) — none of which Spark's
    rand()/orderBy(rand()) can make.

    100 TB shape: NO global window. The seeded hash range-partitions
    the rows (repartitionByRange — sampled boundaries, but the
    output ranks are boundary-INDEPENDENT: over range-disjoint
    sorted partitions, rank = partition offset + local index
    whatever the cut points), each partition sorts locally, and
    keys.zip_index_key assigns the dense global position with one
    tiny per-partition stats job — the same machinery the DWH fact
    key uses. The single-partition ORDER BY form is the DuckDB
    oracle twin, not the execution plan."""
    from clinical_data_warehouse_bi_spark.keys import zip_index_key

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    arranged = (
        df.withColumn("__eh", h)
        .repartitionByRange(n_ranges, F.col("__eh"), F.col(id_col))
        .sortWithinPartitions("__eh", id_col)
    )
    return zip_index_key(arranged, name=pos_col).drop("__eh")


def split_assign(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: str = "split0",
    by_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row draws a
    reproducible uniform u from a PORTABLE md5 of (seed, by value)
    (the weighted_sample construction) and lands in the split whose
    cumulative-fraction interval contains it. ``fractions`` maps
    split name -> fraction, summing to 1 (names in insertion order
    define the intervals, so the same dict always reproduces the
    same assignment).

    ``by_col`` is the assignment KEY, not just an id: rows sharing a
    value land in the SAME split — pass a cluster/domain/patient
    column for leakage-safe splitting (cluster_safe_split composes
    this with the near-dup cluster relation).

    Scale shape: one per-row expression, NO shuffle, no RNG state —
    the same (seed, key) produces the same split on any cluster
    layout and at any later date (Spark's rand() cannot promise
    either), so an append-only corpus keeps its historical
    assignment stable as it grows. The md5-derived uniform is IEEE
    double arithmetic a DuckDB twin reproduces exactly
    (value-checked in tests)."""
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    fracs = [float(fractions[n]) for n in names]
    if any(f <= 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fractions must be positive and sum to 1")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit(":"), F.col(by_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    cum = 0.0
    expr = F.lit(names[-1])  # the last split takes the top interval
    bounds = []
    for n, f in zip(names[:-1], fracs[:-1]):
        cum += f
        bounds.append((n, cum))
    for n, b in reversed(bounds):
        expr = F.when(u <= F.lit(b), F.lit(n)).otherwise(expr)
    return docs.withColumn(out_col, expr)


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    fractions: dict[str, float],
    seed: str = "split0",
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: assignment happens at the NEAR-DUP CLUSTER
    level, so two near-duplicate documents can never straddle
    train/val — the contamination trap a per-document split walks
    into (a val doc whose near-copy sits in train is a leaked label).
    ``clusters`` is a (id, cluster id) relation — e.g. the
    dedup-cluster output of graph.connected_components over LSH/
    SimHash candidate pairs (the q_dedup_clusters relation);
    unclustered documents default to their own id (singleton
    clusters).

    Scale shape: ONE left join against the cluster relation (small
    side: only documents that HAVE a near-dup need rows — AQE
    broadcasts it when it fits) and then split_assign's shuffle-free
    per-row expression on the coalesced key."""
    c = clusters.select(
        F.col(id_col).alias("__sid"), F.col(cluster_col).alias("__scl")
    )
    joined = docs.join(c, docs[id_col] == F.col("__sid"), "left").drop(
        "__sid"
    )
    keyed = joined.withColumn(
        "__skey", F.coalesce(F.col("__scl"), F.col(id_col)).cast("string")
    ).drop("__scl")
    return split_assign(
        keyed, fractions, seed=seed, by_col="__skey", out_col=out_col
    ).drop("__skey")


def remove_boilerplate(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 3,
) -> DataFrame:
    """Per-source boilerplate LINE removal (the CCNet/web-corpus
    cleaning step this module lacked between repetition_filter's
    whole-doc drop and chunk_dedup's cross-doc dedup): a line that
    appears in more than ``min_frac`` of a source's documents is
    navigation/header/footer furniture, not content — strip it from
    every document of that source, preserving the order of the
    surviving lines. Sources with fewer than ``min_docs`` documents
    are left untouched (a 2-doc source would flag half its prose).

    Scale shape (the chunk-dedup discipline): lines leave the scan
    as (source, salted-xxhash64-pair, doc) — line TEXT never
    shuffles; the boilerplate relation is per-source distinct-doc
    counts vs the source's doc count (two slim aggregations); the
    rebuild re-splits the documents map-side and drops positions
    whose hash pair is in the (broadcast) boilerplate set. Returns
    the input schema with ``text_col`` rewritten and an
    ``n_removed_lines`` column appended.

    Line identity is the salted 64-bit pair (xxhash64(x),
    xxhash64('b:', x)) — 128 collision bits like the former md5
    pair (the q_top_ngrams/q_repeated_spans hazard budget), for a
    fraction of the per-line CPU and 16 bytes through the counting
    exchange instead of two 32-char hex strings (round-17 A/B at
    sf0.1: md5 best 1.43/median 1.59 s -> xxhash 1.25/1.56, and
    1.23/1.27 with the keyed fan_out the registered query adds —
    identical output checksums; guide §2.3 narrower types)."""
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> length(trim(x)) > 0)")
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("__src"),
        lines.alias("__lines"),
    )
    # slim per-(source, line) distinct-doc counts: hash pairs only
    hashed = base.select(
        "__id",
        "__src",
        F.explode(
            F.expr(
                "transform(__lines,"
                " x -> named_struct('h1', xxhash64(x), 'h2', xxhash64('b:', x)))"
            )
        ).alias("hp"),
    ).select("__id", "__src", F.col("hp.h1").alias("h1"), F.col("hp.h2").alias("h2"))
    per_line = hashed.distinct().groupBy("__src", "h1", "h2").agg(
        F.count("*").alias("n_docs_with")
    )
    per_src = base.groupBy("__src").agg(F.count("*").alias("n_docs"))
    boiler = (
        per_line.join(F.broadcast(per_src), "__src")
        .where(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_docs_with") > F.lit(min_frac) * F.col("n_docs"))
        )
        .select("__src", "h1", "h2")
    )
    # rebuild entirely MAP-SIDE: collapse each source's boilerplate
    # to a hash set (tiny by construction — furniture lines per
    # source), broadcast it, and filter each document's own line
    # array in place. No doc-keyed exchange, no line text in any
    # shuffle, order preserved trivially.
    boiler_sets = boiler.groupBy("__src").agg(
        F.collect_set(F.expr("named_struct('h1', h1, 'h2', h2)")).alias("__bl")
    )
    out_cols = [c for c in docs.columns if c != text_col]
    enriched = docs.withColumn("__lines", lines).withColumn(
        "__src", F.col(source_col)
    )
    return (
        enriched.join(F.broadcast(boiler_sets), "__src", "left")
        .withColumn(
            "__clean_lines",
            F.expr(
                "IF(__bl IS NULL, __lines,"
                " filter(__lines, x -> NOT array_contains("
                "   __bl, named_struct('h1', xxhash64(x), 'h2', xxhash64('b:', x)))))"
            ),
        )
        .select(
            *out_cols,
            F.expr("array_join(__clean_lines, '\\n')").alias(text_col),
            (F.size("__lines") - F.size("__clean_lines"))
            .cast("bigint")
            .alias("n_removed_lines"),
        )
    )


def dedup_lines(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """WITHIN-document duplicate-line removal (keep the first
    occurrence, preserve order) — the third member of the line
    hygiene family: remove_boilerplate handles cross-doc furniture,
    chunk/cdc dedup handle cross-doc content, this handles the
    page that repeats its own navigation or footer inline (a Gopher
    cleaning rule). Pure per-row array expression: line i survives
    iff it is the FIRST occurrence (array_position == own index).
    Quadratic in a document's OWN line count — bounded by page
    structure, never by corpus size; empty/whitespace lines are
    dropped like remove_boilerplate does. Adds n_removed_lines."""
    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> length(trim(x)) > 0)")
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("__lines", lines)
        .withColumn(
            "__kept",
            F.expr(
                "filter(transform(__lines, (x, i) -> named_struct('t', x, 'i', i)),"
                " s -> array_position(__lines, s.t) = s.i + 1)"
            ),
        )
        .select(
            *out_cols,
            F.expr("array_join(transform(__kept, s -> s.t), '\\n')").alias(text_col),
            (F.size("__lines") - F.size("__kept")).cast("bigint").alias(
                "n_removed_lines"
            ),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    max_occurrences: int = 1,
) -> DataFrame:
    """CROSS-document repeated-span removal at n-gram granularity —
    the sliding-window form of exact-substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models
    Better", public arXiv:2107.06499: remove every later occurrence
    of a sufficiently long substring shared across the corpus;
    approximated here on token n-grams so the machinery stays
    relational). Completes the granularity ladder: doc (corpus
    clean) > paragraph > chunk/CDC > THIS (any aligned n-token
    window) > line (within-doc).

    Rule: the globally FIRST ``max_occurrences`` occurrences of each
    n-gram (order: doc_id, then position) are kept; every LATER
    occurrence is a removal span. Every token covered by a removal
    span is dropped; overlap resolution is removal-wins (a token
    inside both a kept occurrence's window and a later repeated
    window is dropped), which is what makes the rule a pure
    position-set union — deterministic and SQL-expressible for the
    oracle.

    Returns (id, n_tokens, n_removed, clean_text).

    Equality caveat: two occurrences are "the same n-gram" iff their
    (xxhash64(s), xxhash64(s, 'b')) pairs match — same algorithm and
    seed, differing only in a salt operand, so the two 64-bit values
    are correlated rather than independent. A collision silently
    deletes unique text with NO detection path (nothing downstream
    re-checks the strings); acceptable at this bit-width for corpus
    cleaning (the cross-engine tests recompute on strings and would
    surface a systematic collision), but callers who cannot tolerate
    silent false removal should verify candidates on a sample before
    rebuilding.

    Scale shape (the chunk_dedup discipline, one new twist): the
    HEAVY relation never shuffles keyed — the scan reduces each
    sliding window to two salted xxhash64s, so the keep-first window
    exchanges only (id, pos, h1, h2), 28 bytes per token position.
    Token arrays DO move exactly once: the rebuild joins the per-doc
    removal arrays back to the re-tokenized scan on the doc id —
    broadcast while ``removed`` fits the threshold, a single
    doc-id-keyed shuffle of the token arrays at corpus scale (the
    chunk_dedup rebuild contract; re-tokenizing map-side is still
    cheaper than carrying text through the hash exchange). At 100 TB
    the sliding explode is ~n_tokens rows/doc (vs n_tokens/chunk for
    chunk_dedup) — the documented cost of window-aligned
    sensitivity; the hash-exchange payload stays slim either way."""
    n = int(ngram)
    if n < 2:
        raise ValueError("ngram must be >= 2 (use dedup/corpus_clean for 1)")
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col).alias("__id"), tokens(text_col).alias("w"))
    gram_hashes = F.expr(
        f"transform("
        f"  transform(sequence(1, size(w) - {n - 1}),"
        f"            i -> concat_ws(' ', slice(w, i, {n}))),"
        f"  s -> struct(xxhash64(s) as h1, xxhash64(s, 'b') as h2))"
    )
    grams = (
        toks.filter(F.size("w") >= n)
        .select("__id", F.posexplode(gram_hashes).alias("pos", "hp"))
        .select("__id", "pos", F.col("hp.h1").alias("h1"), F.col("hp.h2").alias("h2"))
    )
    part = Window.partitionBy("h1", "h2")
    marked = grams.select(
        "__id",
        "pos",
        F.row_number().over(part.orderBy("__id", "pos")).alias("rn"),
    )
    # removal spans -> per-doc covered token-index set (1-based):
    # span at 0-based pos covers tokens pos+1 .. pos+n
    removed = (
        marked.filter(F.col("rn") > int(max_occurrences))
        .groupBy("__id")
        .agg(F.collect_list("pos").alias("spans"))
        .select(
            "__id",
            F.expr(
                f"array_sort(array_distinct(flatten("
                f"  transform(spans, p -> sequence(p + 1, p + {n})))))"
            ).alias("covered"),
        )
    )
    rebuild = F.expr(
        "array_join(transform("
        "  filter(sequence(1, size(w)), i -> NOT array_contains(covered, i)),"
        "  i -> element_at(w, i)), ' ')"
    )
    return (
        toks.join(removed, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.size("w").cast("bigint").alias("n_tokens"),
            F.coalesce(F.size("covered"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.when(F.size("w") == 0, F.lit(""))
            .when(F.col("covered").isNull(), F.expr("concat_ws(' ', w)"))
            .otherwise(rebuild)
            .alias("clean_text"),
        )
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide most-frequent token n-grams with occurrence and
    document frequencies — the diagnostic that TUNES the dedup
    family (which spans will remove_repeated_spans hit? which lines
    is remove_boilerplate about to strip? is the corpus templated?).
    Returns (ngram, n_occ, n_docs) ordered by (n_occ DESC, ngram
    ASC), limited to k — a deterministic total order an oracle
    reproduces.

    Scale shape (round-17 vectorized-Arrow rewrite of the round-12
    JVM-expr form; guide §4.2 "hand whole batches to vectorized
    native libraries"): BOTH corpus passes are mapInPandas stages —
    tokenize per batch with pandas C string ops, hash every token
    once (pandas hash_pandas_object, C siphash), combine each
    window's n token hashes with a vectorized uint64
    polynomial+splitmix finalizer (numpy: no per-window string, no
    per-window Python bytecode), then

    - count pass: partial-count per task via np.unique, so only slim
      (h1, h2, cnt) partials — vocabulary-sized, not window-sized —
      reach the JVM aggregation; n-gram strings and doc ids never
      enter the count shuffle.
    - recovery pass: np.isin against the driver-collected candidate
      h1 set; strings are built ONLY for the ~k surviving grams'
      occurrences, broadcast-joined against the bounded candidate
      counts (which also removes h1-collision false positives),
      n_docs resolved over surviving occurrences, TakeOrdered to k.

    Measured (alternating A/B, identical 100-row reports,
    scripts/bench_topngrams_arrow.py): equal at sf0.1 (2.13 vs
    2.23 s best — fixed job costs dominate), **2.0x at 16x**
    (7.41 -> 3.74 s) and **2.1x at 64x** (12.93 -> 6.21 s) — the
    r12/r14 records showed map-side hashing was the floor, and the
    vectorized stage moves exactly that. The gram identity is the
    mixed token-hash pair instead of xxhash64-of-elements — same
    grouping semantics modulo 128-bit collisions (the accepted
    hazard budget); the report itself is what the oracle checks.

    Control flow costs ONE driver job before recovery: a single
    TakeOrdered collect of the top candidate (h1, n_occ) rows gives
    the k-th-count threshold AND the candidate h1 set (the old form
    paid separate kth / total-windows / prefilter-collect jobs and
    gated the literal prefilter on volume — np.isin needs no such
    gate). An oversized tie set (> NGRAM_CAND_CAP rows sharing the
    k-th count) falls back to building every window's string before
    the join, exactly like the old fallback."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be positive")
    spark = docs.sparkSession
    schema = "ngram string, n_occ bigint, n_docs bigint"
    counts = (
        docs.select(F.col(text_col).alias("__text"))
        .mapInPandas(_ngram_count_partials(n), "h1 long, h2 long, cnt long")
        .groupBy("h1", "h2")
        .agg(F.sum("cnt").alias("n_occ"))
        .persist()
    )
    try:
        top = (
            counts.select("h1", "n_occ")
            .orderBy(F.col("n_occ").desc(), F.col("h1").asc())
            .limit(NGRAM_CAND_CAP + 1)
            .collect()
        )
        if not top:
            return spark.createDataFrame([], schema)
        kth = int(top[min(k, len(top)) - 1]["n_occ"])
        cand = counts.where(F.col("n_occ") >= kth)
        if len(top) <= NGRAM_CAND_CAP or top[-1]["n_occ"] < kth:
            h1s = [r["h1"] for r in top if r["n_occ"] >= kth]
        else:
            # the tie set overflows the collected prefix: candidate
            # completeness is not guaranteed, fall back to
            # build-then-join over every window (the pre-round-12
            # shape, kept for degenerate tie corpora)
            h1s = None
        rows = (
            docs.select(
                F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
            )
            .mapInPandas(
                _ngram_recovery(n, h1s),
                "__id long, ngram string, h1 long, h2 long",
            )
            .join(F.broadcast(cand), ["h1", "h2"])
            .groupBy("ngram")
            .agg(
                F.first("n_occ").alias("n_occ"),
                F.count_distinct("__id").alias("n_docs"),
            )
            .orderBy(F.col("n_occ").desc(), F.col("ngram").asc())
            .limit(k)
            .select("ngram", "n_occ", "n_docs")
            .collect()
        )
    finally:
        counts.unpersist()
    return spark.createDataFrame(rows, schema)


#: candidate rows collected by top_ngrams' single control job — far
#: above any real k (the report is k<=100 plus ties) while bounding
#: driver memory; a tie set past this falls back to build-then-join
NGRAM_CAND_CAP = 100_000


def _ngram_tokenize_flat(texts):
    """(flat token object-array, per-doc lengths) for a pandas Series
    of texts — the text.tokens contract ([a-z0-9]+ over lower()),
    vectorized via pandas C string ops; nulls tokenize to nothing."""
    import itertools

    import numpy as np

    toks = texts.fillna("").str.lower().str.findall("[a-z0-9]+")
    lens = np.fromiter(
        (len(t) for t in toks), dtype=np.int64, count=len(toks)
    )
    flat = np.fromiter(
        itertools.chain.from_iterable(toks), dtype=object,
        count=int(lens.sum()),
    )
    return flat, lens


def _ngram_win_hashes(th, n):
    """Two independent 64-bit window hashes over a per-token uint64
    hash sequence: polynomial roll + splitmix64-style finalizer,
    fully vectorized (no per-window Python). Returns uint64 arrays of
    length len(th) - n + 1; callers mask doc boundaries."""
    import numpy as np

    def roll(mult, xor_seed):
        m = np.uint64(mult)
        acc = th[: len(th) - n + 1] ^ np.uint64(xor_seed)
        for j in range(1, n):
            acc = acc * m + th[j : len(th) - n + 1 + j]
        z = acc
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z

    return (
        roll(0x9E3779B97F4A7C15, 0),
        roll(0xC2B2AE3D27D4EB4F, 0x6A09E667F3BCC908),
    )


def _ngram_window_mask(lens, n):
    """Boolean mask over flat window-start positions: True iff the
    window does not cross a document boundary."""
    import numpy as np

    total = int(lens.sum())
    if total < n:
        return np.zeros(max(total - n + 1, 0), dtype=bool)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return doc_of[: total - n + 1] == doc_of[n - 1 :]


def _ngram_count_partials(n: int):
    """mapInPandas op: slim (h1, h2, cnt) partial counts per task —
    ONE np.unique over the task's valid windows, so the JVM
    aggregation receives vocabulary-sized partials only."""

    def op(it):
        import numpy as np
        import pandas as pd

        parts = []
        for pdf in it:
            flat, lens = _ngram_tokenize_flat(pdf["__text"])
            if len(flat) < n:
                continue
            th = pd.util.hash_pandas_object(
                pd.Series(flat, dtype=object), index=False
            ).to_numpy()
            h1, h2 = _ngram_win_hashes(th, n)
            mask = _ngram_window_mask(lens, n)
            parts.append(np.stack([h1[mask], h2[mask]], axis=1))
        if parts:
            import numpy as np
            import pandas as pd

            allw = np.concatenate(parts)
            v = np.ascontiguousarray(allw).view([("a", "<u8"), ("b", "<u8")])
            uniq, cnt = np.unique(v, return_counts=True)
            yield pd.DataFrame(
                {
                    "h1": uniq["a"].view(np.int64),
                    "h2": uniq["b"].view(np.int64),
                    "cnt": cnt.astype(np.int64),
                }
            )

    return op


def _ngram_recovery(n: int, cand_h1: list | None):
    """mapInPandas op: (doc id, ngram string, h1, h2) for windows
    whose h1 is in the candidate set (np.isin — vectorized, no
    per-window Python until a window survives); ``cand_h1=None``
    emits every valid window's string (the tie-overflow fallback)."""

    def op(it):
        import numpy as np
        import pandas as pd

        cand = (
            np.asarray(cand_h1, dtype=np.int64).view(np.uint64)
            if cand_h1 is not None
            else None
        )
        for pdf in it:
            flat, lens = _ngram_tokenize_flat(pdf["__text"])
            if len(flat) < n:
                continue
            th = pd.util.hash_pandas_object(
                pd.Series(flat, dtype=object), index=False
            ).to_numpy()
            h1, h2 = _ngram_win_hashes(th, n)
            hit = _ngram_window_mask(lens, n)
            if cand is not None:
                hit = hit & np.isin(h1, cand)
            idx = np.nonzero(hit)[0]
            if len(idx) == 0:
                continue
            doc_ids = np.repeat(pdf["__id"].to_numpy(), lens)
            yield pd.DataFrame(
                {
                    "__id": doc_ids[idx],
                    "ngram": [" ".join(flat[i : i + n]) for i in idx],
                    "h1": h1[idx].view(np.int64),
                    "h2": h2[idx].view(np.int64),
                }
            )

    return op


def chunk_text(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style document chunking: split each document into
    token-windowed chunks of ``chunk_tokens`` whitespace tokens with
    ``overlap_tokens`` carried between neighbors — the
    retrieval-granularity prep step between a raw corpus and a
    passage index (chunk, embed/index, retrieve, cite back to the
    parent via (doc_id, chunk_idx, token span)).

    Chunk boundaries are DETERMINISTIC functions of the token
    sequence (stride = chunk - overlap), so re-chunking a corpus is
    idempotent and chunk ids are stable across runs — the property
    every downstream exactly-once index append relies on.

    Semantics pinned by tests: every token of every document appears
    in at least one chunk; consecutive chunks share exactly
    ``overlap_tokens`` tokens (except a shorter final chunk); a
    document shorter than one chunk yields itself; empty/null text
    yields no chunks. Chunk text joins tokens with single spaces
    (tokenization-normalized, the retrieval tokenizer's view).

    Scale shape: pure per-row array expressions — tokenize once,
    slice per chunk via sequence + transform — ZERO exchanges, no
    UDF; the explode multiplies rows by ceil(tokens/stride), never
    by the quadratic all-pairs a join-based windowing would. The
    short-input guard wraps sequence() because Spark's
    sequence(1, 0) DESCENDS instead of returning empty (the
    top_ngrams lesson)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap_tokens
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), "\\s+").alias(
            "__w"
        ),
    ).withColumn(
        "__w", F.filter("__w", lambda t: t != "")
    ).withColumn("__n", F.size("__w"))
    # number of chunks: 1 + ceil(max(n - chunk, 0) / stride) for n>0
    n_chunks = F.when(
        F.col("__n") <= 0, F.lit(0)
    ).otherwise(
        F.lit(1)
        + F.ceil(
            F.greatest(F.col("__n") - F.lit(chunk_tokens), F.lit(0))
            / F.lit(stride)
        ).cast("int")
    )
    chunked = (
        toks.withColumn("__k", n_chunks)
        .filter(F.col("__k") > 0)
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.col("__k") - 1)),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("token_start"),
            F.least(
                F.col("chunk_idx") * stride + chunk_tokens, F.col("__n")
            ).alias("token_end"),
            F.array_join(
                F.slice(
                    "__w",
                    F.col("chunk_idx") * stride + 1,
                    F.lit(chunk_tokens),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    return chunked


def vocabulary_divergence(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
    min_count: int = 1,
) -> DataFrame:
    """Token-distribution divergence between two corpus snapshots —
    the text twin of qa.drift_report's numeric PSI: before swapping a
    refreshed crawl (or a re-filtered mix) into a training run, the
    question is WHICH tokens moved and by how much. Computes the
    per-token contribution to the Jensen-Shannon divergence between
    the two corpora's unigram distributions (base-2 JS: symmetric,
    bounded [0, 1], defined even where one side is zero — KL is not)
    and returns the ``top_k`` largest contributors:
    (token, p_a, p_b, js_contrib) ordered by (js_contrib DESC, token
    ASC). Summing js_contrib over the FULL vocabulary (top_k = a
    large bound) gives the total JS divergence.

    Tokens below ``min_count`` occurrences in BOTH corpora are
    dropped (hapax noise dominates otherwise); probabilities are
    computed over the full pre-filter token mass so the report's
    p_a/p_b are true corpus frequencies.

    Scale shape: one count aggregation per corpus whose exchange
    carries (token, count) — single tokens are a bounded vocabulary,
    unlike n-grams (top_ngrams' hash-pair discipline exists because
    n-gram vocabulary explodes; unigrams do not) — then a full outer
    join of the two slim count relations, per-row JS arithmetic, and
    a TakeOrdered top-k. Nothing corpus-sized is joined or
    collected; the total-mass scalars ride as 1-row broadcast
    crossJoins."""
    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(f"n_{side}"))
        )

    return divergence_from_counts(
        counts(corpus_a, "a"), counts(corpus_b, "b"), top_k, min_count
    )


def divergence_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    top_k: int = 50,
    min_count: int = 1,
) -> DataFrame:
    """vocabulary_divergence's counts-based core: takes the two
    (token, n_a) / (token, n_b) count relations directly — the shape
    a PERSISTED token-count synopsis serves (streaming.
    read_token_counts), so drift against a reference snapshot never
    re-tokenizes the corpus. Same output contract as
    vocabulary_divergence."""
    if top_k < 1:
        raise ValueError("top_k must be positive")
    tot_a = ca.agg(F.sum("n_a").alias("__ta"))
    tot_b = cb.agg(F.sum("n_b").alias("__tb"))
    joined = (
        ca.join(cb, "token", "full_outer")
        .na.fill({"n_a": 0, "n_b": 0})
        .where((F.col("n_a") >= min_count) | (F.col("n_b") >= min_count))
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
    )
    p = F.col("n_a") / F.col("__ta")
    q = F.col("n_b") / F.col("__tb")
    m = (p + q) / F.lit(2.0)
    # 0*log(0/x) := 0 (the JS convention); log base 2
    term = (
        F.when(F.col("n_a") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("n_b") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    return (
        joined.select(
            "token",
            p.alias("p_a"),
            q.alias("p_b"),
            term.alias("js_contrib"),
        )
        .orderBy(F.col("js_contrib").desc(), F.col("token").asc())
        .limit(top_k)
    )


#: vocabulary rows under which the idf/count relations broadcast; a
#: (term, df, n) row is ~40 B, so 2M rows ~ 80 MB — inside the
#: session's 64m autoBroadcast budget once compressed, far inside
#: executor memory. Above it the join flips to a term-keyed shuffle.
VOCAB_BROADCAST_MAX_ROWS = 2_000_000


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_broadcast_max_rows: int = VOCAB_BROADCAST_MAX_ROWS,
    memoize_size_gate: bool = True,
    count_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the classic
    keyword-extraction / document-labeling primitive (Salton &
    Buckley's term weighting; what a corpus browser shows next to
    each document and what weak-supervision topic tagging starts
    from). Returns (doc_id, term, tf, df, score, rnk) with rnk
    1..k per document; score = round(tf * ln((N + 1)/(df + 1)), 4)
    (add-one-smoothed idf: defined even for a term in every doc) and
    the deterministic total order (score DESC, term ASC) — the
    retrieval.py ln convention: ln is not required to be correctly
    rounded by IEEE 754, so the score is rounded to 4 decimals in
    BOTH engines and the rounded value is the contract.

    Scale shape (three slim exchanges, no raw text in any of them):
    (1) the tf aggregation exchanges distinct (doc, term) pairs with
    map-side partial combine — vocabulary-per-doc granularity, the
    lm.py bigram-count class, never full token streams; the slim tf
    relation is persisted across its two consumers (df derivation
    and scoring — exchange reuse is not guaranteed across a
    broadcast-subtree boundary, the q_skew_report finding; the
    harness's release_new_persistent_rdds reclaims it). (2) df
    falls out of tf as a per-term row count — one vocabulary-sized
    exchange. (3) the per-doc top-k window exchanges scored
    (doc, term) rows — exactly the output-candidate granularity.
    The vocabulary-sized idf relation broadcast-joins back onto tf
    (the lm.py model-broadcast pattern) while it fits
    ``vocab_broadcast_max_rows``; a vocabulary that outgrows the
    budget flips that join — size-gated IN CODE via
    joins.size_gated_broadcast, whose probe is one cheap count over
    the persisted slim tf — to a term-keyed shuffle-hash join of
    two already-slim relations with no other change. N rides as a
    1-row broadcast crossJoin onto the vocabulary relation — never
    a driver-side count.

    ``memoize_size_gate=False`` re-probes the vocabulary size on
    every call: required when ``docs`` reads a source that grows
    under an identical plan (an appended-to directory re-read in one
    session) — the memoized 'fits' verdict would otherwise freeze at
    first sight and broadcast a relation that has outgrown the
    budget.

    ``count_docs`` (round-17): an alternative relation to count N
    from — MUST hold exactly one row per document of ``docs``.
    Callers that rebalance ``docs`` (io.fan_out) pass the raw scan
    here so the document count — a single cheap aggregation that
    needs no rebalance — does not inherit the fan_out's
    full-relation hash exchange (guide §2.4 "Exchange nodes you did
    not expect": the count subtree paid a doc_id repartition of the
    whole id column just to count rows)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be positive")
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    n_docs = (count_docs if count_docs is not None else docs).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    # df = docs-containing-term = row count per term of the DISTINCT
    # (doc, term) relation tf already is
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    from clinical_data_warehouse_bi_spark.joins import size_gated_broadcast

    idf_side, _ = size_gated_broadcast(
        idf, vocab_broadcast_max_rows, memoize=memoize_size_gate
    )
    scored = tf.join(idf_side, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def quality_exprs(text_col: str = "text") -> dict:
    """The Gopher/C4-style cheap quality expressions — ONE definition
    for the three consumers that must agree bit-for-bit
    (q_quality_score, q_corpus_clean's gate, and bench.py's
    corpus-release composition; round-12 review: the blend was
    written out three times and would have diverged silently on the
    first edit). Returns named Columns: n_tokens, stop_ratio
    (stopword hits over distinct types), type_token_ratio, len_score
    (tokens/100 capped at 1), quality_score (0.4/0.3/0.3 blend).
    Expression STRUCTURE is the cross-engine contract: the DuckDB
    oracles mirror it operation-for-operation so IEEE doubles match
    exactly — reassociating the arithmetic here breaks the hash
    gate."""
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_tok = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    stop_ratio = F.size(F.array_intersect(toks, stop_arr)).cast(
        "double"
    ) / F.greatest(n_types, F.lit(1))
    ttr = n_types.cast("double") / F.greatest(n_tok, F.lit(1))
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * stop_ratio + F.lit(0.3) * ttr + F.lit(0.3) * len_score
    )
    return {
        "n_tokens": n_tok,
        "stop_ratio": stop_ratio,
        "type_token_ratio": ttr,
        "len_score": len_score,
        "quality_score": quality,
    }
