"""Clinical BI KPIs over the star-schema DWH: length of stay,
30-day readmission, and daily unit census.

These are the headline reports a clinical-DWH user runs on the
reference's schema (Leemc7/Clinical-Data-Warehouse-BI DWH.sql's
dim_admissions / dim_provider surface; the reference ships the
warehouse, these are the queries its README positions it for).
All three are single-exchange DataFrame plans:

- length of stay: per-row timestamp arithmetic, NO exchange;
  the summary adds one groupBy.
- readmission: ONE patient-keyed exchange (window lead), bounded
  per-patient state — the classic 30-day all-cause readmission
  measure (CMS/NEJM definition: next index admission within N days
  of discharge).
- daily census: map-side interval-to-day explode + one slim
  (unit, day, patient) exchange. The explode factor is bounded by
  ``max_days`` — an UNGUARDED sequence() over a sentinel interval
  (1900-01-01 .. 2999-12-31) would fabricate ~400k rows per bad row
  at 100 TB, so over-cap intervals are excluded up front (they are
  data errors or still-open stays, not census facts).

Sentinel semantics: the staging layer encodes unknown timestamps as
1900-01-01 / 2999-12-31 (star.build_staging, Stage_area.sql:36-50).
Every KPI here treats a sentinel endpoint as NULL — an unknown
admit time cannot order a readmission chain, and an open discharge
has no LOS yet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SENTINEL_LOW = "1900-01-01 00:00:00"
SENTINEL_HIGH = "2999-12-31 23:59:59"

#: seconds per hour / hours per day as doubles, for exact ratios
_SECONDS_PER_HOUR = 3600.0
_HOURS_PER_DAY = 24.0


def _desentinel(col: str) -> Column:
    """A sentinel-encoded timestamp column with the sentinels
    returned to NULL (per-row CASE, no exchange)."""
    c = F.col(col)
    return F.when(
        c.isin(F.lit(SENTINEL_LOW).cast("timestamp"),
               F.lit(SENTINEL_HIGH).cast("timestamp")),
        F.lit(None).cast("timestamp"),
    ).otherwise(c)


def length_of_stay(
    adm: DataFrame,
    admit_col: str = "admittime",
    disch_col: str = "dischtime",
) -> DataFrame:
    """Adds ``los_hours`` (double): discharge minus admit in hours.

    NULL when either endpoint is NULL/sentinel (stay unknown or
    still open) or when the interval is negative (entry error — a
    negative LOS must never average into a report silently).
    Pure per-row JVM arithmetic: zero exchanges, zero UDFs."""
    admit = _desentinel(admit_col)
    disch = _desentinel(disch_col)
    hours = (
        (F.unix_timestamp(disch) - F.unix_timestamp(admit))
        / F.lit(_SECONDS_PER_HOUR)
    )
    return adm.withColumn(
        "los_hours", F.when(hours >= 0, hours)
    )


def los_summary(
    adm: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9),
    admit_col: str = "admittime",
    disch_col: str = "dischtime",
) -> DataFrame:
    """Average/median/p90 length of stay per group (admission type,
    insurance, ...): ONE exchange keyed on the group columns; exact
    JVM `percentile` per group (groups are plentiful and bounded —
    the grouped_percentiles design note applies)."""
    with_los = length_of_stay(adm, admit_col, disch_col)
    aggs = [
        F.count(F.col("los_hours")).alias("n_stays"),
        F.avg("los_hours").alias("avg_los_hours"),
    ]
    for q in quantiles:
        aggs.append(
            F.expr(f"percentile(los_hours, {q!r})").alias(
                f"p{int(round(q * 100))}_los_hours"
            )
        )
    return with_los.groupBy(*group_cols).agg(*aggs)


def readmission_flags(
    adm: DataFrame,
    within_days: int = 30,
    patient_col: str = "patient_id",
    admission_col: str = "admission_id",
    admit_col: str = "admittime",
    disch_col: str = "dischtime",
) -> DataFrame:
    """Per admission: ``days_to_readmit`` (double, gap from this
    discharge to the patient's NEXT admission) and ``readmitted``
    (boolean: 0 <= gap <= within_days).

    The 30-day all-cause readmission measure. ONE exchange: a
    patient-keyed window ordered by (admittime, admission_id) —
    bounded per-patient state, no self-join (the naive interval
    self-join is quadratic in a patient's admission count; lead()
    is linear and needs each patient on one executor only, which is
    exactly what clinical skew allows — no patient has 100 TB of
    admissions).

    Rows whose admit time is NULL/sentinel cannot participate in
    the chain (unknown order) and are returned with NULL gap/flag;
    they are excluded from BOTH sides of the lead, not just masked
    afterwards, so an unknown-admit row never becomes some other
    row's phantom "next admission". The exclusion rides the window
    key itself — partition by (patient, admit-is-unknown) — so the
    unknown rows pass through in the SAME single scan and single
    exchange instead of a filter/union pair that would read the
    input twice (an unknown row's lead is another unknown row,
    whose NULL admit makes gap and flag NULL). Overlapping
    admissions (next admit before this discharge — transfer
    artifacts) yield a negative gap and are NOT counted as
    readmissions."""
    admit = _desentinel(admit_col)
    disch = _desentinel(disch_col)
    based = adm.withColumn("__admit", admit).withColumn("__disch", disch)

    w = Window.partitionBy(
        patient_col, F.col("__admit").isNull()
    ).orderBy(F.col("__admit").asc(), F.col(admission_col).asc())
    gap = (
        (F.unix_timestamp(F.lead("__admit").over(w))
         - F.unix_timestamp(F.col("__disch")))
        / F.lit(_SECONDS_PER_HOUR * _HOURS_PER_DAY)
    )
    flagged = based.withColumn("days_to_readmit", gap).withColumn(
        "readmitted",
        F.when(
            F.col("days_to_readmit").isNotNull(),
            (F.col("days_to_readmit") >= 0)
            & (F.col("days_to_readmit") <= F.lit(float(within_days))),
        ),
    )
    return flagged.drop("__admit", "__disch")


def readmission_rate(
    adm: DataFrame,
    group_cols: list[str],
    within_days: int = 30,
    **kw,
) -> DataFrame:
    """Readmission rate per group: eligible = discharged admissions
    with a known next-or-no-next chain position (admit known);
    readmissions / eligible as a double. Conditional aggregation —
    the flags' patient exchange plus ONE group exchange."""
    flags = readmission_flags(adm, within_days=within_days, **kw)
    # eligible: discharged, admit known (chain position defined).
    # A last admission (no next) IS eligible and not readmitted.
    admit = _desentinel(kw.get("admit_col", "admittime"))
    disch = _desentinel(kw.get("disch_col", "dischtime"))
    is_eligible = (admit.isNotNull() & disch.isNotNull()).cast("int")
    is_readmit = (F.coalesce(F.col("readmitted"), F.lit(False)).cast("int")
                  * is_eligible)
    return (
        flags.groupBy(*group_cols)
        .agg(
            F.sum(is_eligible).alias("n_eligible"),
            F.sum(is_readmit).alias("n_readmitted"),
        )
        .withColumn(
            "readmission_rate",
            F.when(
                F.col("n_eligible") > 0,
                F.col("n_readmitted") / F.col("n_eligible"),
            ),
        )
    )


def daily_census(
    stays: DataFrame,
    unit_col: str = "careunit_id",
    patient_col: str = "patient_id",
    in_col: str = "intime",
    out_col: str = "outtime",
    max_days: int = 365,
) -> DataFrame:
    """Distinct patients present per (unit, calendar day): the bed
    occupancy / daily census report.

    Plan: per-row `sequence(to_date(in), to_date(out))` explode —
    map-side, factor bounded by ``max_days`` — then ONE exchange of
    the slim (unit, day, patient) triple with a distinct aggregate
    (map-side partial dedup applies). A patient present in a unit
    on a day counts once however many overlapping stays put them
    there (the fixtures deliberately overlap transfers).

    The ``max_days`` guard is the scale contract: a sentinel/open
    interval (1900..2999) would otherwise explode into ~400k rows
    PER BAD ROW. Intervals with NULL/sentinel endpoints, negative
    duration, or duration > max_days are excluded up front — they
    are unclosed stays or entry errors, not census facts."""
    if max_days <= 0:
        raise ValueError("max_days must be positive")
    tin = _desentinel(in_col)
    tout = _desentinel(out_col)
    bounded = (
        stays.withColumn("__in", F.to_date(tin))
        .withColumn("__out", F.to_date(tout))
        .filter(
            F.col("__in").isNotNull()
            & F.col("__out").isNotNull()
            & (F.col("__out") >= F.col("__in"))
            & (F.datediff("__out", "__in") <= F.lit(int(max_days)))
        )
    )
    days = bounded.select(
        F.col(unit_col).alias("unit"),
        F.col(patient_col).alias("__pat"),
        F.explode(F.sequence("__in", "__out")).alias("census_date"),
    )
    return (
        days.groupBy("unit", "census_date")
        .agg(
            F.countDistinct("__pat").alias("census"),
            F.count(F.lit(1)).alias("stay_rows"),
        )
    )


def mortality_rate(
    adm: DataFrame,
    patients: DataFrame,
    group_cols: list[str],
    patient_col: str = "patient_id",
    admit_col: str = "admittime",
    disch_col: str = "dischtime",
    dod_col: str = "dod",
) -> DataFrame:
    """In-hospital mortality rate per group — with LOS, readmission
    and census, the fourth KPI on every clinical BI dashboard: an
    admission counts as an in-hospital death when the patient's
    date of death falls inside [admit, discharge] (date grain —
    dod is a date; both endpoints are truncated to dates so a
    death on the discharge DAY counts, the standard convention).

    Eligible = admissions with known admit AND discharge (an open
    or unknown stay has no outcome yet — the readmission_rate
    eligibility discipline). Sentinel timestamps are NULLed first.

    Scale shape: ONE keyed join (patients is the smaller relation
    and carries only (patient_id, dod) into it — AQE broadcasts it
    when it fits) + ONE group exchange for the conditional
    aggregate. No window needed: death-in-interval is a per-row
    predicate."""
    admit = F.to_date(_desentinel(admit_col))
    disch = F.to_date(_desentinel(disch_col))
    dod = F.to_date(F.col("__dod"))
    slim = patients.select(
        F.col(patient_col).alias("__pid"), F.col(dod_col).alias("__dod")
    )
    joined = adm.join(slim, F.col(patient_col) == F.col("__pid"), "left")
    eligible = (admit.isNotNull() & disch.isNotNull()).cast("int")
    died = (
        dod.isNotNull() & admit.isNotNull() & disch.isNotNull()
        & (dod >= admit) & (dod <= disch)
    ).cast("int")
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.sum(eligible).alias("n_eligible"),
            F.sum(died * eligible).alias("n_deaths"),
        )
        .withColumn(
            "mortality_rate",
            F.when(
                F.col("n_eligible") > 0, F.col("n_deaths") / F.col("n_eligible")
            ),
        )
    )
