"""pipeline_corpus_full cross-engine anchor (round-14 verdict item
4): the FULL corpus release composition — boilerplate removal ->
quality gate + exact dedup -> persisted-index decontamination ->
ExactSubstr keep-one-copy -> mix -> chunk -> write — timed on Spark
(corpus.build_corpus_release, the bench.py pipeline_corpus_full
composition) against a DuckDB mirror of every RELEASE-SET-DEFINING
stage, with the released doc_id SET asserted equal between engines.

Mirror scope: boilerplate, quality+dedup, and decontamination decide
WHICH docs are released, so the DuckDB side reproduces them
operation-for-operation and the doc_id sets must match exactly. The
substring strip / mix / chunk stages rewrite or sample the released
set without changing membership of the compared set — each is
already an oracle-checked operator on its own (q_substring_dedup,
q_weighted_sample, q_pack_sequences) — so the mirror instead runs
the span ENUMERATION over the released docs (the dominant cost of
the strip) to keep the timed work comparable, and the Spark side's
extra mix+chunk+parquet-write is reported as-is (an honest
deficit on the Spark number, not the DuckDB one).

Usage: python scripts/bench_corpus_compare.py [factor]
factor 1 runs on /root/testdata/sf0.1 directly; N > 1 on the
bench_scaling N-fold replica (keys shifted, distributions
preserved). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

L = 12  # decontamination window + substring span length (bench_corpus_full)


def duck_mirror_sql(stop_list_sql: str) -> str:
    """The release-set computation as one DuckDB statement over a
    ``documents`` view: returns the released doc_ids. Mirrors
    text.remove_boilerplate (min_frac=0.5, min_docs=3),
    corpus.build_corpus_release's quality gate + keep-min-doc_id
    exact dedup, and suffix.probe_suffix_index's window match
    against the doc_id % 50 = 0 reference slice (the
    bench_corpus_full held-out convention), then enumerates the
    released docs' duplicate windows (the strip stage's dominant
    cost) so the timed work is comparable."""
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
    WITH base AS (
      SELECT doc_id, source,
             list_filter(string_split(text, chr(10)),
                         x -> length(trim(x)) > 0) AS lines
      FROM documents WHERE doc_id % 50 <> 0),
    ln AS (
      SELECT doc_id, source, i, lines[i] AS line
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i) g),
    per_line AS (
      SELECT source, line, count(DISTINCT doc_id) AS n_docs_with
      FROM ln GROUP BY source, line),
    per_src AS (SELECT source, count(*) AS n_docs FROM base GROUP BY source),
    boiler AS (
      SELECT p.source, p.line
      FROM per_line p JOIN per_src s USING (source)
      WHERE s.n_docs >= 3 AND p.n_docs_with > 0.5 * s.n_docs),
    keptl AS (
      SELECT l.doc_id, l.source, l.i, l.line
      FROM ln l LEFT JOIN boiler bo
        ON bo.source = l.source AND bo.line = l.line
      WHERE bo.line IS NULL),
    rebuilt0 AS (
      SELECT doc_id, source,
             string_agg(line, chr(10) ORDER BY i) AS text
      FROM keptl GROUP BY doc_id, source),
    rebuilt AS (
      SELECT b.doc_id, b.source, coalesce(r.text, '') AS text
      FROM base b LEFT JOIN rebuilt0 r USING (doc_id, source)),
    scored AS (
      SELECT doc_id, text, len(toks) AS n_tokens,
             0.4 * (CAST(len(list_intersect(toks, {stop_list_sql})) AS DOUBLE)
                    / greatest(len(list_distinct(toks)), 1))
           + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                    / greatest(len(toks), 1))
           + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS q
      FROM (SELECT doc_id, text, {toks} AS toks FROM rebuilt) raw),
    kept AS (
      SELECT doc_id, text,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fingerprint
      FROM scored WHERE n_tokens >= 30 AND q >= 0.33),
    winners AS (
      SELECT min(doc_id) AS doc_id FROM kept GROUP BY fingerprint),
    rel0 AS (SELECT k.doc_id, k.text FROM kept k JOIN winners USING (doc_id)),
    -- decontamination: reference windows come from the RAW held-out
    -- slice (the index is built before the pipeline runs)
    reft AS (SELECT doc_id, {toks} AS toks FROM documents
             WHERE doc_id % 50 = 0),
    refw AS (
      SELECT DISTINCT array_to_string(toks[i:i+{L - 1}], chr(1)) AS win
      FROM reft, LATERAL (SELECT unnest(generate_series(
             1, len(toks) - {L} + 1)) AS i) g
      WHERE len(toks) >= {L}),
    relt AS (SELECT doc_id, {toks} AS toks FROM rel0),
    relw AS (
      SELECT doc_id, i, array_to_string(toks[i:i+{L - 1}], chr(1)) AS win
      FROM relt, LATERAL (SELECT unnest(generate_series(
             1, len(toks) - {L} + 1)) AS i) g
      WHERE len(toks) >= {L}),
    contaminated AS (
      SELECT DISTINCT w.doc_id FROM relw w JOIN refw USING (win)),
    released AS (
      SELECT r.doc_id FROM rel0 r LEFT JOIN contaminated c USING (doc_id)
      WHERE c.doc_id IS NULL),
    -- strip-stage dominant cost: duplicate-window detection over the
    -- released docs (count only; membership already decided)
    relw2 AS (SELECT w.doc_id, w.win FROM relw w JOIN released USING (doc_id)),
    dupw AS (SELECT win FROM relw2 GROUP BY win HAVING count(*) >= 2),
    spanwork AS (SELECT count(*) AS n FROM relw2 JOIN dupw USING (win))
    SELECT (SELECT n FROM spanwork) AS span_rows,
           list_sort(list(doc_id)) AS released_ids
    FROM released
    """


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import duckdb

    from clinical_data_warehouse_bi_spark.corpus import build_corpus_release
    from clinical_data_warehouse_bi_spark.io import read_table
    from clinical_data_warehouse_bi_spark.queries.text_ops import (
        _STOP_LIST_SQL,
    )
    from clinical_data_warehouse_bi_spark.session import get_spark
    from clinical_data_warehouse_bi_spark.suffix import build_suffix_index
    from scripts.bench_scaling import replicate

    spark = get_spark("corpus-compare")
    sf_dir = BASE if factor == 1 else replicate(spark, factor)

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ref = docs.filter("doc_id % 50 = 0")
    corpus_docs = docs.filter("doc_id % 50 != 0")
    idx = tempfile.mkdtemp(prefix="corpus-cmp-idx-")
    shutil.rmtree(idx, ignore_errors=True)
    build_suffix_index(ref, idx, min_tokens=L, n_buckets=64)

    def run() -> list[int]:
        out_dir = tempfile.mkdtemp(prefix="corpus-cmp-out-")
        try:
            r = build_corpus_release(
                spark, corpus_docs,
                decontaminate_index=idx, substring_dedup=True,
            )
            r["chunks"].repartition(8).write.parquet(
                out_dir, mode="overwrite"
            )
            return sorted(
                row["doc_id"]
                for row in r["release"].select("doc_id").collect()
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    ids_spark = run()  # warm-up, also the compared id set
    spark_best = None
    for _ in range(2):
        t0 = time.time()
        run()
        dt = time.time() - t0
        spark_best = dt if spark_best is None or dt < spark_best else spark_best

    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src})")
    sql = duck_mirror_sql(_STOP_LIST_SQL)
    row = con.execute(sql).fetchone()  # warm-up + the compared id set
    ids_duck = sorted(row[1])
    duck_best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchone()
        dt = time.time() - t0
        duck_best = dt if duck_best is None or dt < duck_best else duck_best

    shutil.rmtree(idx, ignore_errors=True)
    match = ids_spark == ids_duck
    print(json.dumps({
        "factor": factor,
        "n_release": len(ids_spark),
        "released_ids_match": match,
        "spark_sec": round(spark_best, 3),
        "duckdb_sec": round(duck_best, 3),
        "note": "spark side additionally strips+mixes+chunks+writes "
                "parquet; duckdb mirror decides the release set and "
                "enumerates the strip stage's duplicate windows",
        "host_load_1m": round(os.getloadavg()[0], 2),
    }))
    if not match:
        a, b = set(ids_spark), set(ids_duck)
        print(f"only spark: {sorted(a - b)[:20]}", file=sys.stderr)
        print(f"only duck:  {sorted(b - a)[:20]}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
