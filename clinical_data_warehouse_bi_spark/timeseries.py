"""Time-series regularization: per-key resampling onto a fixed grid
with gap filling.

The BI question the reference's calendar dimension exists to serve
(Stage_area.sql builds date rows precisely so sparse facts can be
reported on a dense axis): observed events are irregular, reports
want one row per key per bucket, missing buckets filled by policy
(NULL, zero, or forward-fill of the last observation).

Scale shape: the per-key grid is generated MAP-SIDE from each key's
own (min, max) span via sequence() — no calendar cross-join of every
key against a global axis, which at 100 TB multiplies keys x global
span instead of keys x own span. One key shuffle computes the spans,
the observed aggregates reuse the same key partitioning, and the
forward-fill is one window over (key, bucket) — the exchange is
shared end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_fill(
    obs: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    step: str = "1 day",
    how: str = "ffill",
    exact: bool = False,
) -> DataFrame:
    """(key, bucket timestamp, n_obs bigint, value double): one row
    per ``step`` bucket from each key's first to last observation.
    ``value`` is the bucket's SUM of ``val_col``; empty buckets have
    n_obs = 0 and value by ``how``: 'ffill' carries the last
    observed bucket value forward, 'zero' fills 0.0, 'null' leaves
    NULL. The grid is delimited per key (own min..max span), so a
    short-lived key costs its own lifetime, not the corpus's.

    ``exact=True`` sums in decimal(18,6) and converts via string —
    bit-identical under any partitioning and engine (the cross-engine
    hash-gate convention); default double sums are faster and fine
    for reporting."""
    if how not in ("ffill", "zero", "null"):
        raise ValueError(f"unknown fill policy: {how!r}")
    bucket = F.date_trunc("day" if step == "1 day" else "hour", ts_col)
    if step not in ("1 day", "1 hour"):
        raise ValueError("step must be '1 day' or '1 hour'")
    unit = "day" if step == "1 day" else "hour"
    if exact:
        vexpr = F.col(val_col).cast("decimal(18,6)")
    else:
        vexpr = F.col(val_col).cast("double")
    per_bucket = (
        obs.select(
            F.col(key_col).alias("__k"),
            bucket.alias("__b"),
            vexpr.alias("__v"),
        )
        .groupBy("__k", "__b")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.sum("__v").alias("__raw_sum"),
        )
        .select(
            "__k",
            "__b",
            "n_obs",
            (
                F.col("__raw_sum").cast("string").cast("double")
                if exact
                else F.col("__raw_sum")
            ).alias("__obs_val"),
        )
    )
    spans = per_bucket.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        "__k",
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval 1 {unit})")
        ).alias("__b"),
    )
    dense = grid.join(per_bucket, ["__k", "__b"], "left").select(
        "__k",
        "__b",
        F.coalesce("n_obs", F.lit(0).cast("bigint")).alias("n_obs"),
        "__obs_val",
    )
    if how == "ffill":
        w = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("__obs_val", ignorenulls=True).over(w)
    elif how == "zero":
        filled = F.coalesce("__obs_val", F.lit(0.0))
    else:
        filled = F.col("__obs_val")
    return dense.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias("bucket"),
        "n_obs",
        filled.alias("value"),
    )


def ewma_anomalies(
    obs: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
    k_sigma: float = 3.0,
    warmup: int = 3,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with residual
    anomaly flags — the monitoring primitive a metrics pipeline runs
    over every (key, time, value) stream: a point is anomalous when
    its deviation from the PRE-POINT forecast exceeds ``k_sigma``
    times the EW deviation estimate (the standard EWMA control
    chart). The first ``warmup`` points per key are never flagged
    (no stable baseline yet).

    Scale shape (funnel_steps' fold idiom): ONE exchange on the key,
    each key's series folds linearly inside a single parsed
    aggregate() expression carrying O(1) state (ewma, ewd, n) plus
    the emitted rows — no self-joins, no per-iteration passes, no
    recursive SQL. Per-key memory is the key's own series (the same
    contract as collect_list sessionization); keys are independent
    so a hot key bounds only its own task.

    Returns (key, ts, value, ewma, dev, is_anomaly) — ewma/dev are
    the PRE-point estimates the decision used (round-trip
    reproducible by a driver-side loop; property-tested)."""
    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    ev = obs.select(
        F.col(key_col).alias("__k"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(val_col).cast("double").alias("v")
        ).alias("e"),
    )
    arr = ev.groupBy("__k").agg(F.sort_array(F.collect_list("e")).alias("a"))
    fold = (
        "aggregate(a,"
        " named_struct("
        "   'ewma', cast(0.0 as double), 'ewd', cast(0.0 as double),"
        "   'n', 0,"
        "   'out', cast(array() as"
        "     array<struct<ts:timestamp,v:double,ewma:double,dev:double,an:boolean>>)),"
        " (st, x) -> named_struct("
        f"   'ewma', IF(st.n = 0, x.v, {a} * x.v + {1.0 - a} * st.ewma),"
        f"   'ewd', IF(st.n = 0, 0.0d,"
        f"             {a} * abs(x.v - st.ewma) + {1.0 - a} * st.ewd),"
        "   'n', st.n + 1,"
        "   'out', concat(st.out, array(named_struct("
        "     'ts', x.ts, 'v', x.v,"
        "     'ewma', IF(st.n = 0, cast(null as double), st.ewma),"
        "     'dev', IF(st.n = 0, cast(null as double), st.ewd),"
        f"    'an', st.n >= {int(warmup)}"
        f"          AND abs(x.v - st.ewma) > {float(k_sigma)} * st.ewd"
        "          AND st.ewd > 0.0d)))"
        " )).out"
    )
    flat = arr.select(F.col("__k"), F.explode(F.expr(fold)).alias("r"))
    return flat.select(
        F.col("__k").alias(key_col),
        F.col("r.ts").alias(ts_col),
        F.col("r.v").alias(val_col),
        F.col("r.ewma").alias("ewma"),
        F.col("r.dev").alias("dev"),
        F.col("r.an").alias("is_anomaly"),
    )


def rolling_aggregate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window_days: int,
    aggs: tuple[str, ...] = ("avg", "sum", "count"),
) -> DataFrame:
    """Trailing time-window aggregates per row — the 7-day moving
    average / trailing-sum report (the BI companion of resample_fill:
    that densifies the axis, this smooths along it). For each input
    row: the aggregate of ``value_col`` over the SAME KEY's rows in
    (ts - window_days, ts], expressed as a RANGE window frame so the
    engine keeps a sliding frame, not a self-join.

    Scale shape: ONE exchange on the key columns; the RANGE frame is
    evaluated in a single pass over each key's sorted run (Spark's
    WindowExec maintains the sliding frame incrementally — the naive
    interval self-join this replaces is O(rows x window) and was the
    documented reject). Per-key state is the frame's rows, bounded
    by the window span, not the history.

    RANGE frames need a numeric ordering key: ts is cast to epoch
    MICROSECONDS internally — truncating to whole seconds silently
    moves sub-second-boundary events in or out of the frame (caught
    by the sf0.1 cross-engine gate, where two events 7 days apart
    minus half a second straddled the truncated bound). Output keeps
    the original column.

    Emits <agg>_<window_days>d columns, e.g. avg_7d."""
    if window_days <= 0:
        raise ValueError("window_days must be positive")
    allowed = {"avg", "sum", "count", "min", "max"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"unsupported aggs: {sorted(bad)}")
    span_us = int(window_days) * 86400 * 1_000_000
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-(span_us - 1), 0)
    )
    out = df
    for a in aggs:
        col = F.count(F.lit(1)) if a == "count" else getattr(F, a)(
            F.col(value_col)
        )
        out = out.withColumn(f"{a}_{window_days}d", col.over(w))
    return out


def attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion_pred,
    model: str = "last_touch",
    lookback_days: int | None = None,
) -> DataFrame:
    """Marketing/journey attribution: credit each CONVERSION event
    to a touch channel — ``last_touch`` (the touch nearest before
    the conversion) or ``first_touch`` (the journey's opener) —
    the BI report behind every acquisition dashboard.

    ``conversion_pred`` is a Column predicate marking conversion
    rows; every other row is a touch. ``lookback_days`` is a window
    filter: only touches within that many days BEFORE the conversion
    are eligible, so ``first_touch`` credits the EARLIEST touch
    inside the window (not the journey opener, which may be stale)
    and ``last_touch`` the nearest one inside it (None = unbounded
    journey).

    Returns one row per conversion: (user, conversion ts, credited
    channel, touch ts) — NULL channel when no touch qualifies.

    Declared tiebreak (round 11): same-instant touches are credited
    by CHANNEL order — last_touch takes the lexicographically
    GREATEST channel at the winning instant, first_touch the LEAST.
    Both models pick via min/max over a (epoch, channel, ts) struct,
    so the result is a total order — deterministic in any engine —
    and channel+ts always come from the SAME touch row (the previous
    two independent last_value(ignorenulls) picks could split them
    when a touch carried a NULL channel). Touches with a NULL
    channel are not creditable (they carry no attribution target).

    ``model="both"`` computes last_touch AND first_touch in the SAME
    single window pass (min and max share one WindowSpec, so Catalyst
    plans one Window operator over one exchange — half the scans and
    shuffles of unioning two single-model calls) and emits one row
    per conversion per model with a leading ``model`` column.

    Scale shape: ONE user-keyed exchange; both models are a single
    window pass over each user's timeline (running arg-max/arg-min
    via min/max over the touch struct; the lookback swaps the rows
    frame for a RANGE frame over epoch microseconds — same single
    pass), never a per-conversion self-join against the touch
    history (that join is O(conversions x touches) on power users —
    the skew trap)."""
    if model not in ("last_touch", "first_touch", "both"):
        raise ValueError("model must be last_touch, first_touch or both")
    base = events.withColumn("__conv", conversion_pred)
    # epoch MICROSECONDS, not seconds: second-truncation silently
    # reorders same-second touch/conversion pairs and shifts the
    # lookback horizon by up to a second (the rolling_aggregate
    # sf0.1 lesson applied here)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if lookback_days is None:
        w = (
            Window.partitionBy(user_col)
            .orderBy(epoch, F.col("__conv").cast("int"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        # RANGE frame: eligible touches are those within the horizon
        # before each row's own timestamp. The frame includes same-ts
        # rows (conversions carry NULL touch columns, so only genuine
        # same-instant touches — already eligible under the rows
        # frame — contribute).
        w = (
            Window.partitionBy(user_col)
            .orderBy(epoch)
            .rangeBetween(-int(lookback_days) * 86400 * 1_000_000, 0)
        )
    touch = F.when(
        ~F.col("__conv") & F.col(channel_col).isNotNull(),
        F.struct(
            epoch.alias("e"),
            F.col(channel_col).alias("c"),
            F.col(ts_col).alias("t"),
        ),
    )
    if model == "both":
        conv = (
            base.withColumn("__pl", F.max(touch).over(w))
            .withColumn("__pf", F.min(touch).over(w))
            .filter(F.col("__conv"))
        )
        return conv.select(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("conversion_ts"),
            F.expr(
                "stack(2,"
                " 'last_touch',  __pl.c, __pl.t,"
                " 'first_touch', __pf.c, __pf.t"
                ") AS (model, credited_channel, touch_ts)"
            ),
        )
    pick = (F.max if model == "last_touch" else F.min)(touch).over(w)
    return (
        base.withColumn("credited_channel", pick.getField("c"))
        .withColumn("touch_ts", pick.getField("t"))
        .filter(F.col("__conv"))
        .select(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("conversion_ts"),
            "credited_channel",
            "touch_ts",
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    season: str = "dow",
    baseline_n: int = 4,
    threshold: float = 3.5,
) -> DataFrame:
    """Seasonality-aware anomaly flags: compare each observation to
    the trailing mean of its OWN seasonal slot (same weekday / same
    hour), then score residuals with the robust modified z-score —
    the dashboard rule that catches "this Monday is wrong" without
    paging on the fact that Mondays always spike (a season-blind
    EWMA alarms every weekend; the weekday baseline is the classic
    seasonal-naive forecast).

    ``season``: 'dow' (day-of-week) or 'hour'. Baseline = MEDIAN of
    the previous ``baseline_n`` observations in the same (key,
    slot) — median, not mean, because a mean baseline is poisoned
    by the very anomaly it just flagged and then re-flags the next
    ``baseline_n`` healthy periods as "low" (observed in testing;
    the robust baseline echoes nothing). Spark refuses aggregate
    ``median`` over a window FRAME, so the median is computed
    exactly from the frame's collect_list (array_sort + middle
    element(s)) — ``baseline_n`` is a small constant, so the
    per-row array is bounded. Rows with no history yet get NULL
    baseline/flag (no cold-start false alarms).

    Scale shape: ONE exchange keyed on (key, slot) for the trailing
    frame — per-slot state is ``baseline_n`` rows; residual scoring
    joins the per-key median/MAD of residuals (qa.outlier_report's
    construction: two grouped percentile aggs over the slim residual
    relation). No UDF, no self-join.

    Emits: baseline (double), residual (double), modified_z
    (double), is_anomaly (boolean)."""
    if season == "dow":
        slot = F.dayofweek(F.col(ts_col))
    elif season == "hour":
        slot = F.hour(F.col(ts_col))
    else:
        raise ValueError("season must be 'dow' or 'hour'")
    if baseline_n <= 0:
        raise ValueError("baseline_n must be positive")

    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols], slot)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rowsBetween(-baseline_n, -1)
    )
    hist = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    n = F.size(hist)
    med = F.when(
        n > 0,
        (
            F.element_at(hist, ((n + 1) / 2).cast("int"))
            + F.element_at(hist, (n / 2 + 1).cast("int"))
        )
        / 2.0,
    )
    based = df.withColumn("baseline", med).withColumn(
        "residual", F.col(value_col) - F.col("baseline")
    )
    from clinical_data_warehouse_bi_spark.qa import outlier_report

    scored = outlier_report(
        based.filter(F.col("residual").isNotNull()),
        "residual",
        group_cols=key_cols,
        threshold=threshold,
    ).withColumnRenamed("is_outlier", "is_anomaly")
    cold = (
        based.filter(F.col("residual").isNull())
        .withColumn("modified_z", F.lit(None).cast("double"))
        .withColumn("is_anomaly", F.lit(None).cast("boolean"))
    )
    return scored.unionByName(cold)
