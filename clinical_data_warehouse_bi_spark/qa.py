"""QA.sql as reusable DataFrame checks (SURVEY.md section 5): the
reference's production-data reconciliation suite, faithful to its
quirks (e.g. 'Orphan admissions' counts NULL FKs as orphans because
`LEFT JOIN ... USING` never matches NULL — QA.sql:88-92 — while the
DWH cleanup deliberately keeps NULL-FK rows, DWH.sql:155-157)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
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
