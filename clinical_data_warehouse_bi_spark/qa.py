"""QA.sql as reusable DataFrame checks (SURVEY.md section 5): the
reference's production-data reconciliation suite, faithful to its
quirks (e.g. 'Orphan admissions' counts NULL FKs as orphans because
`LEFT JOIN ... USING` never matches NULL — QA.sql:88-92 — while the
DWH cleanup deliberately keeps NULL-FK rows, DWH.sql:155-157)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _count_row(name: str, label: str, df: DataFrame, value_col: str) -> DataFrame:
    return df.agg(F.count("*").alias(value_col)).select(
        F.lit(name).alias(label), value_col
    )


def rowcount_reconciliation(
    stage: dict[str, DataFrame], dwh: dict[str, DataFrame]
) -> DataFrame:
    """QA.sql:13-59 — stage vs DWH row counts with diff column for the
    6 dims + fact."""
    tables = [
        "dim_patients", "dim_admissions", "dim_provider", "dim_concepts",
        "dim_date", "dim_junk_disorder_event", "fact_disorder_events",
    ]
    rows = []
    for t in tables:
        s = stage[t].agg(F.count("*").alias("stage_rows"))
        d = dwh[t].agg(F.count("*").alias("dwh_rows"))
        rows.append(
            s.crossJoin(d).select(
                F.lit(t).alias("table_name"),
                "stage_rows",
                "dwh_rows",
                (F.col("stage_rows") - F.col("dwh_rows")).alias("diff_rows"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), rows)


def fact_vs_agg(dwh: dict[str, DataFrame]) -> DataFrame:
    """QA.sql:67-71 — COUNT(*) fact == SUM(total_events) agg."""
    f = dwh["fact_disorder_events"].agg(F.count("*").alias("fact_total_events"))
    a = dwh["agg_disorders_per_admission"].agg(
        F.sum("total_events").cast("bigint").alias("agg_total_events")
    )
    return f.crossJoin(a).select(
        F.lit("Fact vs Agg Total").alias("check_name"),
        "fact_total_events",
        "agg_total_events",
        (F.col("fact_total_events") - F.col("agg_total_events")).alias("diff_events"),
    )


def orphan_checks(dwh: dict[str, DataFrame]) -> DataFrame:
    """QA.sql:79-116 — five LEFT JOIN USING(...) IS NULL probes.
    USING-join semantics: a NULL FK never matches, so it counts as an
    orphan (the reference's deliberate quirk for admissions)."""
    fact = dwh["fact_disorder_events"]
    probes = [
        ("Orphan patients", "patient_id", dwh["dim_patients"]),
        ("Orphan admissions", "admission_id", dwh["dim_admissions"]),
        ("Orphan concepts", "clinical_concept_id", dwh["dim_concepts"]),
        ("Orphan dates", "event_datetime", dwh["dim_date"]),
        ("Orphan junk_id", "junk_id", dwh["dim_junk_disorder_event"]),
    ]
    rows = []
    for name, key, dim in probes:
        orphans = fact.join(
            F.broadcast(dim.select(key).distinct()), on=key, how="left_anti"
        )
        rows.append(_count_row(name, "issue", orphans, "num_records"))
    return reduce(lambda a, b: a.unionByName(b), rows)


def duplicate_checks(dwh: dict[str, DataFrame]) -> DataFrame:
    """QA.sql:124-176 — five GROUP BY ... HAVING count(*)>1 probes on
    dimension primary keys."""
    probes = [
        ("Duplicate patients", dwh["dim_patients"], "patient_id"),
        ("Duplicate admissions", dwh["dim_admissions"], "admission_id"),
        ("Duplicate concepts", dwh["dim_concepts"], "clinical_concept_id"),
        ("Duplicate dates", dwh["dim_date"], "event_datetime"),
        ("Duplicate junk", dwh["dim_junk_disorder_event"], "junk_id"),
    ]
    rows = []
    for name, dim, key in probes:
        dupes = dim.groupBy(key).count().filter(F.col("count") > 1)
        rows.append(_count_row(name, "issue", dupes, "num_dupes"))
    return reduce(lambda a, b: a.unionByName(b), rows)


def run_all(stage: dict[str, DataFrame], dwh: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {
        "rowcounts": rowcount_reconciliation(stage, dwh),
        "fact_vs_agg": fact_vs_agg(dwh),
        "orphans": orphan_checks(dwh),
        "duplicates": duplicate_checks(dwh),
    }


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format data profile — the load-validation report a DWH
    runs on every fresh table (the generalization of QA.sql's
    hand-written per-table probes): for each column, row count, null
    count, exact distinct count, and min/max rendered as strings.

    Two clean jobs, both scale-safe:
    1. min/max for ALL columns in ONE aggregation (no DISTINCT
       aggregates, so no Expand blowup — the anti-pattern
       test_agg_per_order_has_no_expand locks elsewhere).
    2. distinct/null counts via stack() unpivot to (column, value)
       then a single-DISTINCT groupBy — two-phase partial aggregation,
       one shuffle of (column, value) pairs, never k separate
       count-distinct Expands. Rows multiply by k columns, but the
       unpivot is a projection (no shuffle of the wide row).
    """
    cols = list(cols or df.columns)
    k = len(cols)
    # job 1 exprs: min/max on the NATIVE column type (numeric/date
    # ordering, not lexicographic — cast-then-min would report e.g.
    # max '9.0' for a quantity column reaching 50), rendered as
    # strings only for the uniform report schema
    mm = df.agg(
        *[F.min(F.col(c)).cast("string").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c)).cast("string").alias(f"mx_{i}") for i, c in enumerate(cols)],
    )
    # job 2: unpivot -> per-column counts (single DISTINCT aggregate)
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols
    )
    long = df.select(
        F.expr(f"stack({k}, {stack_args}) AS (column, value)")
    )
    counts = long.groupBy("column").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_nulls"),
        F.countDistinct("value").alias("n_distinct"),
    )
    spark = df.sparkSession
    mm_row = mm.first()
    mm_df = spark.createDataFrame(
        [
            (c, mm_row[f"mn_{i}"], mm_row[f"mx_{i}"])
            for i, c in enumerate(cols)
        ],
        "column string, min_value string, max_value string",
    )
    return counts.join(mm_df, "column").select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format Pearson correlation over numeric columns — the
    profiler's (qa.profile_table) second-order companion for load
    validation (a broken feed often shows up as a correlation flip
    before any single-column bound moves). Returns (col_a, col_b,
    corr double, rounded to 6) for every unordered pair a < b.

    ONE aggregation job computes all k*(k-1)/2 coefficients as
    parallel corr() expressions — map-side partial moments, a
    single-row reduce, no Expand, no per-pair pass over the data;
    the k^2 cell count is a driver-side constant, never a row
    multiplier."""
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    if not pairs:
        raise ValueError("correlation_matrix needs at least two columns")
    row = df.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    ).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(a, b, row[f"c_{i}"]) for i, (a, b) in enumerate(pairs)],
        "col_a string, col_b string, corr double",
    )


# ---------------------------------------------------------------------------
# Declarative expectation suite (beyond-reference, round 8)
# ---------------------------------------------------------------------------
#
# Generalizes the reference's hand-written QA probes (QA.sql:13-116)
# into a compiled check suite, the Great-Expectations/dbt-test shape a
# warehouse team actually maintains. The compiler's scale contract:
#
#   * every row-expression check on a table (not_null, accepted_range,
#     accepted_values) folds into ONE aggregation pass over that table
#     - sum(violation_flag) columns + a shared count(*) - so a suite
#     of 20 column checks on a 100 TB fact costs one scan, not 20;
#   * unique checks compile to the two-level aggregation from
#     q_qa_rowcount_report (groupBy keys -> count, then one-row agg):
#     map-side partial dedup, never an Expand over the whole row.
#     When a table has BOTH a unique check and row-expression checks,
#     the row checks ride the unique check's first-level aggregation
#     (per-key partial flag sums) - one scan serves all of them;
#   * referential checks are broadcast left_anti counts (the dim side
#     is the small side by construction in a star schema);
#   * cross_sum checks (fact vs pre-aggregate reconciliation,
#     QA.sql:67-71) are two scalar aggregates cross-joined - O(1)
#     driver traffic.
#
# Each check yields (check_name, violations, total_rows, passed).

# Flags and report branches are built as SQL TEXT, not Column trees:
# each Python operator on a Column object is a py4j round-trip, and a
# full suite costs hundreds of them (~0.7 s of pure driver-side plan
# build, measured) — one F.expr parse per branch is the same plan for
# a fraction of the latency (the percentiles.py lesson, SURVEY #12).

def _sq(name: str) -> str:
    """Single-quoted SQL string literal (quotes doubled)."""
    return "'" + name.replace("'", "''") + "'"


def _inline_checks(rows: list[tuple[str, str, str]]) -> str:
    """inline(array(named_struct(...))) emitting one (check_name,
    violations, total_rows) row per entry, all from ONE parse."""
    structs = ", ".join(
        f"named_struct('check_name', {_sq(nm)}, 'violations',"
        f" CAST({viol} AS BIGINT), 'total_rows', CAST({tot} AS BIGINT))"
        for nm, viol, tot in rows
    )
    return f"inline(array({structs}))"


def _unique_per_key(
    df: DataFrame, cols: list[str], name_flags: list
) -> DataFrame:
    """Level-1 of the unique aggregation: one row per key tuple with
    its row count and the table's row-check partial sums. The wide
    second-level aggregate expectation_report builds over it answers
    the unique count, every row check, and the rebasable cross_sum
    sides (count(*), count(DISTINCT key-col)) from this ONE
    scan+exchange."""
    return df.groupBy(*cols).agg(
        F.expr("count(*) AS _c"),
        *[
            F.expr(f"sum(CAST(({flag}) AS BIGINT)) AS _v_{i}")
            for i, (_, flag) in enumerate(name_flags)
        ],
    )


def expectation_report(
    tables: dict[str, DataFrame], spec: list[dict]
) -> DataFrame:
    """Compile a declarative expectation spec into the minimal set of
    Spark jobs and return one row per check:
    (check_name, violations, total_rows, passed).

    Spec entries (dicts)::

        {"check": "not_null", "table": t, "column": c}
        {"check": "accepted_range", "table": t, "column": c,
         "lo": x | None, "hi": y | None}      # null passes; use
                                              # not_null to forbid it
        {"check": "accepted_values", "table": t, "column": c,
         "values": [...]}
        {"check": "unique", "table": t, "columns": [c, ...]}
        {"check": "referential", "table": t, "column": fk,
         "ref_table": d, "ref_column": k}     # null FK passes
        {"check": "cross_sum", "name": n, "table": a, "expr": sql_a,
         "other_table": b, "other_expr": sql_b}
                                              # violations = |a - b|,
                                              # total_rows = a
    """
    import re as _re

    per_table_flags: dict[str, list] = {}
    unique_specs: dict[str, list[list[str]]] = {}
    refs: list[dict] = []
    crosses: list[dict] = []

    # row-expression flags come from the builder shared with
    # observe_expectations, so inline and dedicated reports can never
    # drift apart
    _ROW_KINDS = ("not_null", "accepted_range", "accepted_values")
    _collect_row_flags(
        [e for e in spec if e["check"] in _ROW_KINDS], per_table_flags
    )

    for e in spec:
        kind = e["check"]
        if kind in _ROW_KINDS:
            continue
        if kind == "unique":
            unique_specs.setdefault(e["table"], []).append(e["columns"])
        elif kind == "referential":
            refs.append(e)
        elif kind == "cross_sum":
            crosses.append(e)
        else:
            raise ValueError(f"unknown expectation kind: {kind}")

    # Assembly principle: a union of per-check branches recomputes
    # shared sub-plans per branch (column pruning specializes each
    # branch's aggregate below the exchange, defeating ReusedExchange
    # — measured: 4 lineitem scans for 4 lineitem checks). Instead,
    # every check is compiled to SCALARS over one-row-per-table
    # aggregate relations, all crossJoined (1-row x 1-row) into a
    # single wide row, and the report rows are emitted by ONE inline()
    # over it — so each table is scanned exactly once for ALL its
    # scalar checks (unique + row flags + count(*)/count(DISTINCT
    # key) sides), plus one slim fk-column-only broadcast-anti scan
    # per referential check (measured faster than fusing the probe
    # into the wide aggregate — see the referential note below).
    scalars: list[DataFrame] = []  # one-row relations to crossJoin
    out_rows: list[tuple[str, str, str]] = []  # (name, viol, total) SQL
    base: dict[str, list[str]] = {}  # t -> first unique's columns
    extra_aggs: dict[str, list[str]] = {}  # t -> extra per_key aggs

    def has_total(t: str) -> bool:
        return t in base or t in per_table_flags

    def _total(t: str) -> str:
        return f"__{t}_total"

    # cross_sum sides: decide rebasing BEFORE building the per-table
    # aggregates so count(DISTINCT key-col) rides the base scan
    cross_sides: list[list[str]] = []  # SQL scalar names per (a, b)
    raw_id = iter(range(10**6))
    for e in crosses:
        side_names = []
        for t, expr in ((e["table"], e["expr"]),
                        (e["other_table"], e["other_expr"])):
            uniq0 = unique_specs.get(t, [[]])[0]
            m = _re.match(
                r"(?is)^\s*count\(\s*distinct\s+(\w+)\s*\)\s*$", expr
            )
            if m and m.group(1) in uniq0:
                col = m.group(1)
                nm = f"__{t}_cd_{col}"
                extra_aggs.setdefault(t, []).append(
                    f"CAST(count(DISTINCT {col}) AS BIGINT) AS {nm}"
                )
                side_names.append(nm)
            elif _re.match(r"(?s)^\s*count\(\s*\*\s*\)\s*$", expr) and (
                t in unique_specs or t in per_table_flags
            ):
                side_names.append(_total(t))
            else:
                nm = f"__raw_{next(raw_id)}"
                scalars.append(
                    tables[t].agg(
                        F.expr(f"CAST(({expr}) AS BIGINT) AS {nm}")
                    )
                )
                side_names.append(nm)
        cross_sides.append(side_names)

    # Referential checks stay STANDALONE broadcast-anti probes — NOT
    # fused into the fact's wide aggregate — on round-11 measurement:
    # fusing (fact LEFT JOIN broadcast deduped ref keys, violation
    # flag riding the per-key partial sums) removes the probe's
    # second fact scan but measured SLOWER at sf0.1 (lineitem side
    # 1.00-1.27 s fused vs 0.83 s anti+separate) — every fact row
    # pays a hash probe inside the hot aggregation pipeline, plus the
    # broadcast-side dedup stage — and the anti's extra scan reads
    # ONLY the fk column (pruned+pushed). It is also the safer 100 TB
    # shape: when the ref table outgrows broadcast and AQE falls back
    # to a shuffle join, the anti form shuffles just the slim fk
    # column, where a fused join would drag the whole wide-aggregate
    # input through the fk exchange before its per-key aggregation.

    # one aggregate relation per table: the FIRST unique check absorbs
    # the table's row-expression checks (per-key partial flag sums)
    # and the rebased cross_sum distincts into its per-key level
    for t in {*per_table_flags, *unique_specs}:
        flags = per_table_flags.get(t, [])
        uniqs = unique_specs.get(t, [])
        if uniqs:
            base[t] = uniqs[0]
            per_key = _unique_per_key(tables[t], uniqs[0], flags)
            wide = per_key.agg(
                F.expr(f"CAST(sum(_c) AS BIGINT) AS {_total(t)}"),
                F.expr(f"count(*) AS __{t}_distinct"),
                *[
                    F.expr(f"sum(_v_{i}) AS __{t}_v_{i}")
                    for i in range(len(flags))
                ],
                *[F.expr(a) for a in dict.fromkeys(extra_aggs.get(t, []))],
            )
            scalars.append(wide)
            out_rows.append((
                f"unique:{t}." + "+".join(uniqs[0]),
                f"{_total(t)} - __{t}_distinct",
                _total(t),
            ))
            for j, cols in enumerate(uniqs[1:], 1):
                extra = _unique_per_key(tables[t], cols, []).agg(
                    F.expr(f"CAST(sum(_c) AS BIGINT) AS __{t}_u{j}_total"),
                    F.expr(f"count(*) AS __{t}_u{j}_distinct"),
                )
                scalars.append(extra)
                out_rows.append((
                    f"unique:{t}." + "+".join(cols),
                    f"__{t}_u{j}_total - __{t}_u{j}_distinct",
                    f"__{t}_u{j}_total",
                ))
        elif flags:
            scalars.append(
                tables[t].agg(
                    F.expr(f"CAST(count(*) AS BIGINT) AS {_total(t)}"),
                    *[
                        F.expr(
                            f"sum(CAST(({flag}) AS BIGINT)) AS __{t}_v_{i}"
                        )
                        for i, (_, flag) in enumerate(flags)
                    ],
                )
            )
        for i, (flag_nm, _) in enumerate(flags):
            out_rows.append((flag_nm, f"__{t}_v_{i}", _total(t)))

    for j, e in enumerate(refs):
        t, fk = e["table"], e["column"]
        d, k = e["ref_table"], e["ref_column"]
        nm = f"referential:{t}.{fk}->{d}.{k}"
        if fk == k:
            raise ValueError(
                f"referential check {nm}: fk and ref column share the"
                " name; alias one side so the join condition is"
                " unambiguous"
            )
        scalars.append(
            tables[t].where(f"{fk} IS NOT NULL")
            .join(F.broadcast(tables[d]), F.expr(f"{fk} = {k}"), "left_anti")
            .agg(F.expr(f"CAST(count(*) AS BIGINT) AS __ref_{j}"))
        )
        if not has_total(t):
            scalars.append(
                tables[t].agg(
                    F.expr(f"CAST(count(*) AS BIGINT) AS {_total(t)}")
                )
            )
            per_table_flags.setdefault(t, [])  # has_total now true
        out_rows.append((nm, f"__ref_{j}", _total(t)))

    for e, (sa, sb) in zip(crosses, cross_sides):
        out_rows.append(
            (f"cross_sum:{e['name']}", f"abs({sa} - {sb})", sa)
        )

    if not scalars or not out_rows:
        raise ValueError("expectation spec compiled to no checks")
    one = reduce(lambda x, y: x.crossJoin(y), scalars)
    out = one.selectExpr(_inline_checks(out_rows))
    return out.selectExpr(
        "check_name",
        "CAST(violations AS BIGINT) AS violations",
        "CAST(total_rows AS BIGINT) AS total_rows",
        "violations = 0 AS passed",
    )


def drift_report(
    baseline: DataFrame,
    current: DataFrame,
    cols: list[str],
    n_bins: int = 10,
    threshold: float = 0.2,
    eps: float = 1e-4,
) -> DataFrame:
    """Distribution-drift detection between two snapshots of a table:
    Population Stability Index per numeric column, the standard
    monitoring statistic (psi < 0.1 stable, > 0.2 action — the
    conventional thresholds).

    Bin edges come from the BASELINE's quantiles (one approxQuantile
    driver call, O(cols x bins) scalars); then per-bin counts for
    ALL columns compile into ONE aggregation pass per side —
    n_cols x n_bins sum(CASE) expressions, built as SQL text — so a
    20-column drift check on a 100 TB snapshot pair costs exactly
    two scans. PSI itself is arithmetic over the two 1-row results,
    computed driver-side on O(cols x bins) numbers.

    Returns (column, psi, drifted) — drifted = psi > threshold."""
    import math

    edges_by_col: dict[str, list[float]] = {}
    qs = [i / n_bins for i in range(1, n_bins)]
    quantiles = baseline.approxQuantile(cols, qs, 0.001)
    for c, es in zip(cols, quantiles):
        uniq = sorted({float(e) for e in es if e is not None})
        edges_by_col[c] = uniq

    def bin_exprs(side: str) -> list[str]:
        exprs = []
        for c, edges in edges_by_col.items():
            bounds = [None, *edges, None]
            for b in range(len(edges) + 1):
                lo, hi = bounds[b], bounds[b + 1]
                conds = [f"{c} IS NOT NULL"]
                if lo is not None:
                    conds.append(f"{c} > {lo!r}")
                if hi is not None:
                    conds.append(f"{c} <= {hi!r}")
                exprs.append(
                    f"sum(CASE WHEN {' AND '.join(conds)} THEN 1 ELSE 0 END)"
                    f" AS {side}_{c}_{b}"
                )
        exprs.append(f"count(*) AS {side}_total")
        return exprs

    b_row = baseline.agg(*[F.expr(e) for e in bin_exprs("b")]).first()
    c_row = current.agg(*[F.expr(e) for e in bin_exprs("c")]).first()

    out = []
    for c, edges in edges_by_col.items():
        nb = len(edges) + 1
        b_tot = max(b_row["b_total"], 1)
        c_tot = max(c_row["c_total"], 1)
        psi = 0.0
        for b in range(nb):
            p = max((b_row[f"b_{c}_{b}"] or 0) / b_tot, eps)
            q = max((c_row[f"c_{c}_{b}"] or 0) / c_tot, eps)
            psi += (q - p) * math.log(q / p)
        out.append((c, float(psi), bool(psi > threshold)))
    spark = baseline.sparkSession
    return spark.createDataFrame(out, "column string, psi double, drifted boolean")


def corpus_card(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    out_path: str | None = None,
    lexical: bool = False,
) -> dict:
    """The dataset card for a training corpus — the governance
    artifact shipped next to the shards: size, token statistics,
    exact-duplicate rate, predicted-language mix, source mix, and
    quality-score distribution, all from this engine's own operators.

    Cost: one fused scalar aggregation (counts, token sums, distinct
    fingerprints via two-level agg), one approxQuantile pass over a
    slim per-doc projection, and one broadcast-lexicon language
    argmax — O(scans) bounded regardless of how many stats the card
    carries. Writes JSON to ``out_path`` when given (use an
    underscore-prefixed name next to parquet shards)."""
    import json

    from clinical_data_warehouse_bi_spark import text as T

    toks = T.tokens(text_col)
    per_doc = docs.select(
        F.col(id_col).alias("__id"),
        *([F.col(source_col)] if source_col else []),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.md5(F.col(text_col)).alias("__fp"),
    )
    per_fp = per_doc.groupBy("__fp").agg(
        F.count("*").alias("c"), F.sum("n_tokens").alias("tks")
    )
    scal = per_fp.agg(
        F.expr("CAST(sum(c) AS BIGINT) AS n_docs"),
        F.expr("count(*) AS n_distinct_texts"),
        F.expr("CAST(sum(tks) AS BIGINT) AS n_tokens"),
    ).first()
    qs = per_doc.approxQuantile("n_tokens", [0.5, 0.9, 0.99], 0.001)

    from clinical_data_warehouse_bi_spark.queries.text_ops import _predicted_lang

    lang_mix = {
        r["lang"]: r["n"]
        for r in _predicted_lang(docs.sparkSession, docs)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    src_mix = {}
    if source_col:
        src_mix = {
            r[source_col]: r["n"]
            for r in per_doc.groupBy(source_col).agg(F.count("*").alias("n")).collect()
        }
    lex = (
        {"lexical": {k: v for k, v in zipf_profile(docs, text_col).items()
                     if k in ("zipf_slope", "unigram_entropy_bits", "vocab_size")}}
        if lexical
        else {}
    )
    card = {
        **lex,
        "n_docs": scal["n_docs"],
        "n_tokens": scal["n_tokens"],
        "exact_dup_rate": round(
            1.0 - scal["n_distinct_texts"] / max(scal["n_docs"], 1), 6
        ),
        "tokens_per_doc": {
            "mean": round(scal["n_tokens"] / max(scal["n_docs"], 1), 2),
            "p50": qs[0],
            "p90": qs[1],
            "p99": qs[2],
        },
        "lang_mix": lang_mix,
        "source_mix": src_mix,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(card, f, indent=2, sort_keys=True)
    return card


def schema_drift(baseline: DataFrame, current: DataFrame) -> DataFrame:
    """Schema-level drift between two snapshots of a table: one row
    per changed column — added, removed, or type_changed — the check
    that runs BEFORE drift_report's value-level PSI (a feed that
    silently renamed or retyped a column should fail loudly, not
    skew a histogram). Pure metadata comparison: zero jobs."""
    b = dict(baseline.dtypes)
    c = dict(current.dtypes)
    rows = []
    for col in sorted(set(b) | set(c)):
        if col not in c:
            rows.append((col, "removed", b[col], None))
        elif col not in b:
            rows.append((col, "added", None, c[col]))
        elif b[col] != c[col]:
            rows.append((col, "type_changed", b[col], c[col]))
    spark = baseline.sparkSession
    return spark.createDataFrame(
        rows,
        "column string, change string, baseline_type string, current_type string",
    )


def observe_expectations(
    df: DataFrame, spec: list[dict], name: str = "expectations"
):
    """ZERO-extra-pass data-quality: attach the suite's
    row-expression checks (not_null / accepted_range /
    accepted_values) to a DataFrame as a Spark Observation — the
    violation counters ride whatever action the pipeline runs next,
    so a 100 TB transform gets its quality report for free instead
    of paying expectation_report's dedicated scan. Aggregating,
    join-key-dependent, or cross-table checks (unique, referential,
    cross_sum) cannot ride a row stream; route those through
    expectation_report.

    Returns (df_with_observation, observation); after ANY action on
    the returned frame, ``observation.get`` yields
    {check_name: violations, "__total_rows": n}. The check
    expressions are the SAME SQL-text flags the batch compiler
    emits, so inline and dedicated reports can never disagree."""
    from pyspark.sql import Observation

    allowed = {"not_null", "accepted_range", "accepted_values"}
    bad = [e["check"] for e in spec if e["check"] not in allowed]
    if bad:
        raise ValueError(
            f"observe_expectations supports row-expression checks only"
            f" ({sorted(allowed)}); got {bad} — use expectation_report"
        )
    tables = {e["table"] for e in spec}
    if len(tables) != 1:
        raise ValueError(
            "observe_expectations rides ONE DataFrame; the spec names"
            f" tables {sorted(tables)}"
        )
    flags: list = []
    # reuse the compiler's flag-building by running the shared spec
    # loop in flag-collection mode
    t = next(iter(tables))
    probe: dict[str, list] = {}
    _collect_row_flags(spec, probe)
    name_flags = probe[t]
    obs = Observation(name)
    exprs = [
        F.expr(f"sum(CAST(({flag}) AS BIGINT))").alias(nm)
        for nm, flag in name_flags
    ] + [F.expr("count(*)").alias("__total_rows")]
    return df.observe(obs, *exprs), obs


def _collect_row_flags(spec: list[dict], per_table_flags: dict) -> None:
    """The row-expression half of expectation_report's compiler,
    shared so inline observation and the dedicated report build
    IDENTICAL flag SQL."""

    def lit_sql(v) -> str:
        return _sq(v) if isinstance(v, str) else repr(v)

    for e in spec:
        kind = e["check"]
        if kind == "not_null":
            t, c = e["table"], e["column"]
            per_table_flags.setdefault(t, []).append(
                (f"not_null:{t}.{c}", f"{c} IS NULL")
            )
        elif kind == "accepted_range":
            t, c = e["table"], e["column"]
            conds = []
            if e.get("lo") is not None:
                conds.append(f"{c} < {lit_sql(e['lo'])}")
            if e.get("hi") is not None:
                conds.append(f"{c} > {lit_sql(e['hi'])}")
            cond = " OR ".join(conds) if conds else "FALSE"
            per_table_flags.setdefault(t, []).append(
                (f"accepted_range:{t}.{c}", f"{c} IS NOT NULL AND ({cond})")
            )
        elif kind == "accepted_values":
            t, c = e["table"], e["column"]
            vals = ", ".join(lit_sql(v) for v in e["values"])
            per_table_flags.setdefault(t, []).append(
                (
                    f"accepted_values:{t}.{c}",
                    f"{c} IS NOT NULL AND {c} NOT IN ({vals})",
                )
            )


def zipf_profile(docs: DataFrame, text_col: str = "text", top_n: int = 1000) -> dict:
    """Corpus lexical-statistics profile: the Zipf exponent (slope of
    log-rank vs log-frequency over the ``top_n`` words, least
    squares) and unigram entropy in bits — the two scalars that
    flag synthetic/templated corpora (natural language sits near
    slope -1; a generator with a tiny vocabulary shows a flat slope
    and low entropy). One distributed word histogram (bpe's
    word_histogram job) + a bounded driver fit.

    Returns {"zipf_slope", "unigram_entropy_bits", "vocab_size",
    "n_tokens"}."""
    import math

    import numpy as np

    from clinical_data_warehouse_bi_spark.bpe import word_histogram

    hist = word_histogram(docs, text_col=text_col)
    totals = hist.agg(
        F.sum("n").alias("n_tokens"), F.count("*").alias("vocab")
    ).first()
    n_tokens = int(totals["n_tokens"] or 0)
    if n_tokens == 0:
        raise ValueError("zipf_profile: empty corpus")
    top = (
        hist.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(int(top_n))
        .collect()
    )
    freqs = np.array([r["n"] for r in top], dtype=np.float64)
    ranks = np.arange(1, len(freqs) + 1, dtype=np.float64)
    # closed-form least-squares slope (cov/var) — np.polyfit's SVD
    # path can fail to converge on degenerate (constant-y) inputs
    lx, ly = np.log(ranks), np.log(freqs)
    vx = float(((lx - lx.mean()) ** 2).sum())
    slope = (
        0.0
        if vx == 0.0
        else float(((lx - lx.mean()) * (ly - ly.mean())).sum() / vx)
    )
    # exact unigram entropy from the FULL histogram via one more
    # aggregate (sum p log p needs every word, not just the top)
    ent_row = hist.agg(
        F.sum(
            F.expr(f"(n / {float(n_tokens)!r}) * log2(n / {float(n_tokens)!r})")
        ).alias("neg_ent")
    ).first()
    entropy = -float(ent_row["neg_ent"])
    return {
        "zipf_slope": slope,
        "unigram_entropy_bits": entropy,
        "vocab_size": int(totals["vocab"]),
        "n_tokens": n_tokens,
    }


def pivot_report(
    df: DataFrame,
    rows: list[str],
    pivot_col: str,
    pivot_values: list,
    aggs: dict[str, str],
) -> DataFrame:
    """BI pivot: one wide row per ``rows`` key with one aggregate
    column per (pivot value x agg) — the cross-tab every BI frontend
    asks a warehouse for (the reference's DBeaver dashboards pivot
    the pre-agg exactly this way; the complement of q_rollup's
    grouping-set grain ladder). ``aggs`` maps value column ->
    aggregate name (sum/count/avg/min/max); output columns are
    ``{pivot_value}_{agg}_{col}``.

    ``pivot_values`` is REQUIRED, not discovered: explicit values
    keep the schema data-independent and bound the column set (every
    pivot value is a physical column — a high-cardinality pivot
    belongs in q_rollup's tall form instead).

    Deliberately NOT DataFrame.pivot: Spark's pivotfirst plans TWO
    exchanges (pre-aggregate on (rows, pivot_col), then re-group on
    rows). Conditional aggregation — agg(sum(when(p = v, x))) per
    value — is the same relation in ONE pass: one map-side partial
    aggregate keyed on ``rows``, one exchange, exactly the cost of
    the tall aggregate (plan-locked in tests). This is also
    literally the DuckDB CASE-WHEN oracle shape, so the cross-engine
    twin test pins values expression-for-expression.

    Round-10 registration candidate (value-checked in
    tests/test_properties.py)."""
    if not pivot_values:
        raise ValueError("pivot_values must be explicit and bounded")
    agg_exprs = []
    for col, how in aggs.items():
        if how not in ("sum", "count", "avg", "min", "max"):
            raise ValueError(f"unsupported agg: {how}")
        for v in pivot_values:
            gated = F.when(F.col(pivot_col) == F.lit(v), F.col(col))
            agg_exprs.append(
                getattr(F, how)(gated).alias(f"{v}_{how}_{col}")
            )
    return df.groupBy(*rows).agg(*agg_exprs)


def unpivot_report(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Inverse of pivot_report: melt wide metric columns back to the
    tall (id, metric, value) form the storage layer and q_rollup's
    grouping sets want. Pure projection (Spark's native unpivot /
    stack) — each input row expands to len(value_cols) rows map-side,
    NO shuffle, no type surprises (values are cast to a common
    type by Spark's unpivot contract)."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    return df.unpivot(
        [F.col(c) for c in ids],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def benford_profile(
    df: DataFrame, col: str, int_scale: int | None = None
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-numbers / data-entry-anomaly screen for
    financial and clinical measurement columns (Newcomb 1881,
    Benford 1938, Nigrini's audit practice; all public). Natural
    multi-scale positive data follows P(d) = log10(1 + 1/d);
    hand-entered, capped, or synthesized columns don't.

    Returns 9 rows: (digit, n, observed_p, expected_p, abs_dev) for
    digits 1-9 over the column's non-null non-zero values (sign
    ignored). The release rule follows Nigrini's MAD bands: mean
    abs_dev < 0.006 close conformity, > 0.015 nonconformity — left
    to the caller because the right band depends on n.

    Digit derivation (round-11 ADVICE): when the column is a
    fixed-point quantity with a known decimal scale (prices: pass
    ``int_scale=2``), the digit comes from the EXACT decimal string
    of the integer ``floor(|x| * 10^scale + 0.5)`` — one IEEE
    multiply/add/floor (bit-identical in any IEEE engine) followed
    by integer-to-string, which is exact. This is the cross-engine
    registered form: it avoids BOTH known divergence channels —
    libm log10 is not correctly rounded at exact powers of 10 (JVM
    vs DuckDB can flip the digit bucket), and double-to-string
    rendering differs too (JDK-4511638: Java 17 prints 1e23 as
    9.999999999999999E22 where shortest-roundtrip prints 1.0E23).
    Values that round to 0 at the given scale are excluded with the
    zeros (sub-resolution noise, not a leading digit).

    The default (``int_scale=None``) keeps the general log10 path
    for arbitrary-magnitude doubles, hardened against the exponent
    off-by-one: if floor(log10(v)) lands one low/high the raw
    quotient falls in [10,100) / [0,1) and is renormalized, so a
    miscomputed log10 can no longer emit digit 0 or 10 — but the
    corrected digit may still differ by one bucket from another
    engine's libm at exact powers of 10, so cross-engine gates use
    the int_scale form.

    Scale shape: digit extraction is one per-row JVM expression;
    then ONE groupBy over a 9-value key space — map-side partials
    reduce each partition to <= 9 rows before the exchange. No UDF,
    no second scan (the total comes from a window over the 9-row
    relation, not another pass)."""
    v = F.abs(F.col(col).cast("double"))
    if int_scale is not None:
        units = F.floor(v * F.pow(F.lit(10.0), F.lit(int_scale)) + F.lit(0.5))
        keep = F.col(col).isNotNull() & (units > 0)
        digit = F.substring(units.cast("string"), 1, 1).cast("int")
    else:
        e = F.floor(F.log10(v))
        raw = v / F.pow(F.lit(10.0), e)
        d0 = F.floor(raw)
        digit = (
            F.when(d0 >= 10, F.floor(raw / F.lit(10.0)))
            .when(d0 < 1, F.floor(raw * F.lit(10.0)))
            .otherwise(d0)
        ).cast("int")
        keep = F.col(col).isNotNull() & (v > 0)
    counts = (
        df.filter(keep)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy()
    with_p = counts.withColumn(
        "observed_p", F.col("n") / F.sum("n").over(total)
    ).withColumn(
        "expected_p", F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    )
    return with_p.select(
        "digit",
        "n",
        "observed_p",
        "expected_p",
        F.abs(F.col("observed_p") - F.col("expected_p")).alias("abs_dev"),
    )


def outlier_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier flags via the modified z-score
    (Iglewicz & Hoaglin 1993): 0.6745 * (x - median) / MAD, flagged
    beyond ``threshold`` (their recommended 3.5). Mean/std outlier
    rules break exactly when needed most — the outliers inflate the
    std that is supposed to catch them; median/MAD have a 50%
    breakdown point.

    Returns the input plus (modified_z double, is_outlier boolean);
    rows in groups with MAD = 0 (over half the group identical) get
    NULL z and are flagged only if x != median — the documented
    degenerate case, not an error.

    Scale shape (grouped): the median and MAD ride ONE window
    exchange partitioned by the group columns — the second window
    reuses the first's partitioning, there is no join back, and
    NULL-valued group keys form their own group exactly as groupBy
    would (an equality join back would silently drop them).
    Per-group state is that group's values on one executor (the
    grouped_percentiles trade). Keyless: the two scalars come from
    global aggregates broadcast-joined back, so the full rows never
    move (a global window would drag every column to one partition;
    for bounded-state exact global percentiles see
    percentiles.exact_percentiles_distributed). No UDF anywhere."""
    keys = list(group_cols or [])
    z = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
    )
    flag = F.when(
        F.col("__mad") > 0, F.abs(F.col("modified_z")) > threshold
    ).otherwise(F.col(value_col) != F.col("__med"))

    if not keys:
        base = df.withColumn("__g", F.lit(1))
        med = base.groupBy("__g").agg(
            F.expr(f"percentile({value_col}, 0.5)").alias("__med")
        )
        with_med = base.join(F.broadcast(med), "__g")
        mad = (
            with_med.withColumn(
                "__absdev", F.abs(F.col(value_col) - F.col("__med"))
            )
            .groupBy("__g")
            .agg(F.expr("percentile(__absdev, 0.5)").alias("__mad"))
        )
        return (
            with_med.join(F.broadcast(mad), "__g")
            .withColumn("modified_z", z)
            .withColumn("is_outlier", flag)
            .drop("__med", "__mad", "__g")
        )

    w = Window.partitionBy(*[F.col(k) for k in keys])
    return (
        df.withColumn(
            "__med", F.expr(f"percentile({value_col}, 0.5)").over(w)
        )
        .withColumn(
            "__mad",
            F.expr(
                f"percentile(abs({value_col} - __med), 0.5)"
            ).over(w),
        )
        .withColumn("modified_z", z)
        .withColumn("is_outlier", flag)
        .drop("__med", "__mad")
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> dict:
    """Join/aggregation skew diagnostic for a prospective shuffle
    key: the numbers that decide between a plain hash join, a
    broadcast, AQE skew-split, or explicit salting BEFORE a 100 TB
    job discovers the hot key the slow way.

    Returns a dict of scalars plus the top-N keys:
    - n_rows, n_keys, avg_rows_per_key
    - max_key_rows, max_key_share (the hot key's fraction)
    - p99_key_rows (approx), hhi (Herfindahl concentration,
      sum of squared key shares: 1/n_keys = uniform, 1 = one key;
      EXACT and distributive — a decile/Gini approximation goes
      blind precisely when one hot key hides among millions)
    - suggested_salt: ceil(max_key_rows / avg_rows_per_key) capped
      at 256 — the replication factor that would level the hot key
      to roughly average, 1 = no salting needed
    - top_keys: [(key..., n), ...] the N heaviest keys

    Scale shape: ONE groupBy to the per-key histogram (map-side
    partials), then scalar aggregates + a TakeOrdered top-N over
    that histogram — the histogram relation (n_keys rows) is the
    only thing beyond the scan, and only N rows + a dozen scalars
    reach the driver."""
    import math

    if not key_cols:
        raise ValueError("skew_report needs at least one key column")
    hist = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    hist = hist.persist()
    try:
        stats = hist.agg(
            F.sum("__n").alias("rows"),
            F.count(F.lit(1)).alias("keys"),
            F.max("__n").alias("mx"),
            F.expr("approx_percentile(__n, 0.99)").alias("p99"),
            F.avg("__n").alias("avg"),
            F.sum(F.col("__n").cast("double") * F.col("__n")).alias("sq"),
        ).first()
        top = [
            (*[r[c] for c in key_cols], r["__n"])
            for r in hist.orderBy(F.desc("__n")).limit(top_n).collect()
        ]
    finally:
        hist.unpersist()
    n_rows, n_keys = stats["rows"], stats["keys"]
    avg = stats["avg"]
    return {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "avg_rows_per_key": avg,
        "max_key_rows": stats["mx"],
        "max_key_share": (stats["mx"] / n_rows) if n_rows else None,
        "p99_key_rows": stats["p99"],
        "hhi": (stats["sq"] / (n_rows * n_rows)) if n_rows else None,
        "suggested_salt": min(256, max(1, math.ceil(stats["mx"] / avg)))
        if avg
        else 1,
        "top_keys": top,
    }


def freshness_report(
    df: DataFrame,
    ts_col: str,
    as_of,
    source_col: str | None = None,
    recent_hours: int = 24,
) -> DataFrame:
    """Data-freshness audit for an event-time table: per source (or
    one row overall), the newest and oldest event, the lag from
    ``as_of`` to the newest event in hours, and the row count inside
    the trailing ``recent_hours`` window — the first thing an
    on-call checks when a dashboard flatlines (is the pipeline
    stale, or is the world quiet?).

    ``as_of`` is an EXPLICIT timestamp (string or datetime), never
    now(): deterministic reports, replayable tests, and no
    wall-clock skew between driver and data (the repo's
    reproducibility rule).

    ONE fused aggregation — min/max/conditional-count share the
    single scan; no window, no second pass."""
    if recent_hours <= 0:
        raise ValueError("recent_hours must be positive")
    ref = F.lit(as_of).cast("timestamp")
    keys = [F.col(source_col)] if source_col else []
    lag_h = (
        (F.unix_timestamp(ref) - F.unix_timestamp(F.max(F.col(ts_col))))
        / 3600.0
    )
    recent = F.sum(
        (
            F.col(ts_col)
            >= ref - F.make_dt_interval(hours=F.lit(int(recent_hours)))
        ).cast("long")
    )
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts_col).alias("oldest"),
        F.max(ts_col).alias("newest"),
        lag_h.alias("lag_hours"),
        recent.alias(f"rows_last_{recent_hours}h"),
    )
    return out


#: auto-mode budget for snapshot_diff's uniqueness probe: probe when
#: the side's parquet-footer row count is at or under this (or when
#: the input is not a file scan — then it is driver-bounded anyway)
SNAPSHOT_UNIQUE_PROBE_MAX_ROWS = 100_000_000


#: optimized-plan node names that can EMIT MORE ROWS than their scan
#: holds — any of these voids the footer-sum upper bound below
_ROW_MULTIPLYING_NODES = (
    "Join", "Generate", "InPandas", "MapPartitions", "CoGroup",
    "MapGroups", "FlatMap",
    # round-16 advice: Expand (rollup/cube/grouping-sets) replicates
    # every input row per grouping set, MapInArrow and the
    # *EvalPython nodes run arbitrary-arity Python — all can emit
    # more rows than the scan footers hold
    "Expand", "MapInArrow", "EvalPython",
)


def _plan_multiplies_rows(df: DataFrame) -> bool:
    """True when ``df``'s optimized plan contains an operator that
    can produce more output rows than its inputs hold (join,
    generate/explode, arbitrary-arity Python transforms) — the
    shapes for which a parquet-footer sum is NOT an upper bound.
    Conservative: an unreadable plan counts as multiplying."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 — plan not inspectable
        return True
    import re

    # operator names lead each plan line (after tree-drawing glyphs);
    # matching there never confuses a column alias for an operator
    pat = "|".join(_ROW_MULTIPLYING_NODES)
    return bool(
        re.search(rf"^[\s+:\-]*'?\w*(?:{pat})", plan, re.MULTILINE)
    )


def _footer_rows(df: DataFrame) -> int | None:
    """Sum of parquet-footer row counts behind ``df``'s scan — a
    driver-side metadata read (io.parquet_num_rows per input file),
    no job. None when any input is not footer-readable OR the plan
    contains a row-multiplying operator (join/generate/...), since
    the footer sum upper-bounds only scan/filter/project-shaped
    plans — filters shrink a scan, but a join or explode can emit
    far more rows than its input files hold (round-14 advice)."""
    import pyarrow.parquet as pq

    if _plan_multiplies_rows(df):
        return None
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file-backed plan
        return None
    if not files:
        return 0  # in-memory relation: driver-bounded by construction
    total = 0
    for f in files:
        if not f.endswith(".parquet"):
            return None
        try:
            total += int(
                pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
            )
        except Exception:  # noqa: BLE001 — unreadable footer
            return None
    return total


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    fingerprint_col: str = "fp",
    *,
    check_unique: bool | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table — the
    reconciliation primitive an incremental pipeline runs before
    publishing a refreshed corpus/dimension (which rows appeared,
    which vanished, which changed in place) and the row-grain
    companion of the scalar A3/A4 reconciliation probes. Both inputs
    must already carry ``key_cols`` plus a ``fingerprint_col`` — a
    caller-built canonical digest of the compared payload (the
    caller owns canonicalization because only it knows the types:
    quantize doubles, epoch-second timestamps, NULL sentinels — the
    cross-engine conventions; see q_snapshot_diff for the model).

    Returns (key_cols..., change, fp_old, fp_new) with change in
    ('added', 'removed', 'changed'); unchanged rows are filtered
    before the result ever materializes.

    Scale shape: each side reduces map-side to a slim
    (keys, fingerprint) projection — the payload itself never enters
    the exchange — then ONE null-safe full-outer join on the keys
    classifies every row. A full outer cannot broadcast (both sides
    must survive), so the exchange is the two slim projections —
    ~key + 32 hex chars per row, the minimum a row-level diff can
    ship. Snapshots bucketed by the key join with zero exchange.

    ASSUMES ``key_cols`` is a unique key on EACH side — a snapshot
    diff is only defined per key. Duplicate keys fan out in the
    full-outer join, silently multiplying added/removed/changed rows
    (and the join skews on the duplicated key). DEFAULT
    (``check_unique=None``, round-13 verdict item 9): the probe runs
    AUTOMATICALLY — loud failure on a duplicate-keyed snapshot —
    gated by a free footer check: when a side's parquet-footer row
    count (driver-side metadata, no job) exceeds
    SNAPSHOT_UNIQUE_PROBE_MAX_ROWS the probe is skipped for that
    side (at that scale the two extra count jobs are real money and
    the caller is expected to own key hygiene upstream; pass
    ``check_unique=True`` to force it anyway). Non-file-backed
    inputs are driver-bounded and always probed. ``check_unique=
    False`` opts out entirely (the hot-path production setting once
    a pipeline's keys are trusted)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if check_unique is None:
        rows_old, rows_new = _footer_rows(old), _footer_rows(new)
        check_unique = (
            rows_old is not None
            and rows_new is not None
            and rows_old <= SNAPSHOT_UNIQUE_PROBE_MAX_ROWS
            and rows_new <= SNAPSHOT_UNIQUE_PROBE_MAX_ROWS
        )
    if check_unique:
        for side, df in (("old", old), ("new", new)):
            total = df.count()
            distinct = df.select(*key_cols).distinct().count()
            if distinct != total:
                raise ValueError(
                    f"snapshot_diff: key_cols {key_cols} are not unique "
                    f"on the {side} side ({total} rows, {distinct} "
                    "distinct keys) — the diff would fan out"
                )
    # explicit presence markers: a NULL key or NULL fingerprint on a
    # PRESENT side must not read as side-absent (NULL keys are real
    # groups here, the repo's null-safe-join convention)
    # string aliases, not DataFrame-attribute columns: old and new
    # commonly derive from the SAME scan (snapshot vs mutated
    # snapshot), and attribute references across a self-join are
    # ambiguous to the analyzer
    o = old.select(
        *key_cols,
        F.col(fingerprint_col).alias("fp_old"),
        F.lit(1).alias("__in_old"),
    ).alias("__sd_old")
    n = new.select(
        *key_cols,
        F.col(fingerprint_col).alias("fp_new"),
        F.lit(1).alias("__in_new"),
    ).alias("__sd_new")
    cond = None
    for k in key_cols:
        c = F.col(f"__sd_old.{k}").eqNullSafe(F.col(f"__sd_new.{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    # coalesce each key across sides (either may be side-absent NULL)
    keys = [
        F.coalesce(F.col(f"__sd_old.{k}"), F.col(f"__sd_new.{k}")).alias(k)
        for k in key_cols
    ]
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~F.col("fp_old").eqNullSafe(F.col("fp_new")), "changed")
    )
    return (
        joined.select(*keys, change.alias("change"), "fp_old", "fp_new")
        .where(F.col("change").isNotNull())
    )
