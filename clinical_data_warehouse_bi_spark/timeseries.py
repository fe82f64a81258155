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
