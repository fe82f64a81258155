"""Distributed EXACT interpolated percentiles with bounded state on
BOTH sides of the driver/executor split.

``queries.core.exact_percentiles_bucketed`` (round 3) bounded the
executor aggregation state at O(4096) but still merged per-group
histograms on the driver — O(groups x columns x occupied buckets)
counters plus a Python loop per rank item, which becomes the
bottleneck exactly when the group key is high-cardinality (percentiles
per admission: millions of groups). This module is the round-5 fix:
rank resolution itself is a DataFrame plan — cumulative windows over
the histogram relation, rank-target location as a broadcast join, and
value lookup only inside rank-holding buckets — so the driver never
materializes a histogram. Driver-visible data is O(1): optional probe
scalars and one (max-bucket-count, target-count) pair per refinement
level; the located-target relations live as executor-side
localCheckpoints.

Definition matched bit-for-bit (property-tested): DuckDB
``quantile_cont`` == Spark ``percentile`` — value at continuous index
(n-1)*p of the sorted multiset; interpolation uses Spark
Percentile.getPercentile's exact arithmetic (the two-sided weighted
form, lower value alone at integral positions — ``lo + (hi-lo)*frac``
is 1 ulp off on some inputs).

Reference analogue: the BI summary surface (DWH.sql:203-210).

Pass/job structure (bucketed path) — two passes over the data, three
Spark jobs in the common no-refinement case:

  bounds   global (min, max) per column from parquet FOOTER stats
           when the caller has them (io.parquet_numeric_bounds — a
           driver metadata read, NO job); else one probe job, which
           also feeds the native-`percentile` fast path for verified
           low-cardinality columns
  locate   pass 1 over the data: long-form v (group, col, value,
           b0/b1/b2 nested 4096-way bucket indexes, literal
           arithmetic so membership at any level is integer
           path-prefix equality) -> histogram groupBy (group, col,
           b0) -> ONE window per (group, col) yields each bucket's
           running count AND the group total -> rank targets
           t=(n-1)*p (floor/ceil) fall out of a broadcast join with
           the tiny spec relation filtered to the rank-holding
           bucket. The group universe (for all-NULL groups) rides
           the SAME job via exchange reuse. Output localCheckpoints:
           O(groups x specs) rows on executors, lineage truncated.
  refine   only if a tiny stat read over that checkpoint shows a
           rank-holding bucket above ``refine_cap``: re-locate those
           ranks inside level-1 (then level-2) sub-buckets — one
           extra pass each, same shape; 4096^3 positions exhaust
           double precision on any real range
  resolve  pass 2 over the data: rows path-joined to the broadcast
           needed-bucket set, row_number over value order INSIDE
           each rank-holding bucket, rank row picked by a join, ONE
           groupBy(group) pivots lo/hi and interpolates — all lazy,
           executed by the caller's action.

Executor state: histogram hash-agg O(4096) per group; the resolve
window externally sorts one bucket's rows (<= refine_cap except in
the degenerate one-repeated-value case, where the sort input is
duplicates of a single value and spills harmlessly)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: buckets per refinement level (matches the round-3 bucketed form)
BUCKETS = 4096
#: max rows a rank-holding bucket may span before another refinement
#: level is consulted; also bounds the resolve window's sort input
REFINE_CAP = 262144
#: static refinement depth: 3 nested levels = 4096^3 ~ 6.9e10
#: addressable positions per column range — below double-precision
#: resolution for any non-degenerate range
LEVELS = 3
#: located-target row bound under which the needed-bucket relations
#: are explicitly broadcast into the refine/resolve joins
_BROADCAST_TARGETS = 1_000_000


def _idx(v: Column, lo: Column, w: Column) -> Column:
    """Clamped fixed-width bucket index of ``v`` in [lo, lo+w] —
    the exact arithmetic shape every level shares (same IEEE ops at
    assignment and lookup). ``w`` must be non-zero (callers pass
    ``width or 1.0`` literals)."""
    raw = F.floor((v - lo) / w * F.lit(float(BUCKETS))).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(BUCKETS - 1))


def _path_eq(path: list[str], left: str, right: str) -> Column:
    cond = F.col(f"{left}.__vk").eqNullSafe(F.col(f"{right}.__vk")) & (
        F.col(f"{left}.__vci") == F.col(f"{right}.__vci")
    )
    for c in path:
        cond = cond & (F.col(f"{left}.{c}") == F.col(f"{right}.{c}"))
    return cond


def exact_percentiles_distributed(
    df: DataFrame,
    key: str,
    specs: dict[str, list[tuple[float, str]]],
    native_distinct_max: int = 65536,
    refine_cap: int = REFINE_CAP,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group, fully distributed.

    ``specs``: {column: [(fraction, output_name), ...]}. Returns a
    lazy DataFrame (key, *output_names) — output names in spec order,
    all double. NULL measures are excluded from ranks (percentile
    semantics) but all-NULL groups stay visible with NULL results;
    NULL group keys flow through null-safe joins.

    ``bounds``: exact global (min, max) per column, e.g. from
    io.parquet_numeric_bounds — when it covers every spec column the
    probe job (and the native-path routing that needs its distinct
    estimates) is skipped entirely. Wider-than-actual bounds are
    harmless (buckets just sit sparser); WRONG bounds are not.

    Without ``bounds``: if every column's global approx-distinct is
    below ``native_distinct_max``, delegates to Spark's native
    `percentile` (its per-group value->count state is bounded by the
    verified distinct count); `native_distinct_max=0` forces the
    bucketed refinement (how the equivalence tests pin that path)."""
    spark = df.sparkSession
    cols = list(specs)
    names = [name for c in cols for _, name in specs[c]]

    if bounds is not None and all(c in bounds for c in cols):
        live = list(range(len(cols)))
        lows = {ci: float(bounds[cols[ci]][0]) for ci in live}
        widths = {
            ci: (float(bounds[cols[ci]][1]) - lows[ci]) or 1.0 for ci in live
        }
    else:
        # probe: global bounds + distinct sketch — ONE job, O(cols)
        # scalars, the only data the driver ever collects
        p_aggs = []
        for ci, c in enumerate(cols):
            p_aggs += [
                F.min(F.col(c).cast("double")).alias(f"mn_{ci}"),
                F.max(F.col(c).cast("double")).alias(f"mx_{ci}"),
                F.approx_count_distinct(c).alias(f"ad_{ci}"),
            ]
        probe = df.agg(*p_aggs).collect()[0].asDict()

        live = [ci for ci in range(len(cols)) if probe[f"mn_{ci}"] is not None]
        if not live:
            # every spec column is globally NULL: NULL results per group
            return df.select(F.col(key)).distinct().select(
                F.col(key), *[F.lit(None).cast("double").alias(n) for n in names]
            )
        if native_distinct_max and all(
            probe[f"ad_{ci}"] <= native_distinct_max for ci in live
        ):
            n_aggs = [
                F.expr(f"percentile({c}, {pfrac})").alias(name)
                for c in cols
                for pfrac, name in specs[c]
            ]
            return df.groupBy(F.col(key)).agg(*n_aggs)
        lows = {ci: probe[f"mn_{ci}"] for ci in live}
        widths = {ci: (probe[f"mx_{ci}"] - lows[ci]) or 1.0 for ci in live}

    # v: long-form (group, col, value, 3-level bucket path), one
    # skinny branch per column (branches scan in parallel tasks; each
    # branch bakes ITS column's bounds in as literals). Path columns
    # are ints: membership at level L == equality on (b0..bL). Lazy —
    # derived twice (locate pass, resolve pass); two scans beat
    # caching the widened relation.
    # each branch's three bucket-path expressions are built as ONE
    # parsed SQL select (lateral column aliases) — a Column-object
    # tower here costs ~40 py4j round-trips per level per branch of
    # pure plan-build latency (SURVEY.md §9 item 7)
    def idx_sql(lo_sql: str, w: float) -> str:
        return (
            f"least(greatest(cast(floor((__pv - {lo_sql}) / {w!r}D * "
            f"{float(BUCKETS)!r}D) as int), 0), {BUCKETS - 1})"
        )

    parts = []
    for ci in live:
        lo0, w0 = lows[ci], widths[ci]
        w1, w2 = w0 / BUCKETS, w0 / BUCKETS / BUCKETS
        lo1 = f"({lo0!r}D + cast(b0 as double) * {w1!r}D)"
        lo2 = f"({lo1} + cast(b1 as double) * {w2!r}D)"
        parts.append(
            df.select(
                F.col(key).alias("__vk"),
                F.lit(ci).cast("int").alias("__vci"),
                F.col(cols[ci]).cast("double").alias("__pv"),
            ).selectExpr(
                "__vk",
                "__vci",
                "__pv",
                f"IF(__pv IS NULL, -1, {idx_sql(repr(lo0) + 'D', w0)}) AS b0",
                f"IF(__pv IS NULL, -1, {idx_sql(lo1, w1)}) AS b1",
                f"IF(__pv IS NULL, -1, {idx_sql(lo2, w2)}) AS b2",
            )
        )
    v = parts[0]
    for part in parts[1:]:
        v = v.unionByName(part)

    #: level-0 histogram INCLUDING the NULL bucket (-1) — the one
    #: shuffle of v in the locate pass; both consumers below (rank
    #: targets, group universe) reuse its exchange, so the pass scans
    #: the data once
    histn = v.groupBy("__vk", "__vci", "b0").agg(F.count("*").alias("cnt"))

    spec_rows = [
        (ci, float(pfrac), name)
        for ci in live
        for pfrac, name in specs[cols[ci]]
    ]
    # locate, level 0: ONE window pass over the histogram (the NULL
    # bucket -1 rides through, excluded from counts by the positive
    # guard) gives each bucket its running count (cb), its group's
    # total (n), and a row_number; the rank targets fall out of a
    # broadcast join with the spec relation filtered to the bucket
    # whose [cb, cb+cnt) span holds floor/ceil((n-1)*p). The group
    # universe (for all-NULL groups) rides the SAME linear pipeline
    # as a sentinel spec row (name NULL) kept for each group's first
    # histogram row — one subtree, one scan, nothing to re-derive
    # (a separate distinct() branch would NOT reuse the histogram
    # exchange: column pruning gives the two branches different
    # canonical plans).
    w = Window.partitionBy("__vk", "__vci").orderBy("b0")
    pos = F.when(F.col("b0") >= 0, F.col("cnt")).otherwise(F.lit(0))
    h3 = (
        histn.withColumn(
            "cb",
            F.sum(pos).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - pos,
        )
        .withColumn(
            "n",
            F.sum(pos).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn("rn1", F.row_number().over(w))
    )
    sentinel = [(live[0], None, None)]
    specs2 = spark.createDataFrame(
        spec_rows + sentinel, "ci int, pfrac double, name string"
    )
    t_expr = (F.col("n") - 1).cast("double") * F.col("pfrac")
    is_target = F.col("name").isNotNull()
    located = (
        h3.join(F.broadcast(specs2), F.col("__vci") == F.col("ci"))
        .withColumn("t", t_expr)
        .select(
            "__vk",
            "__vci",
            "name",
            "t",
            "cnt",
            "cb",
            "b0",
            "rn1",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("which"), F.floor("t").alias("rank")),
                    F.struct(F.lit(1).alias("which"), F.ceil("t").alias("rank")),
                )
            ).alias("tg"),
        )
        .filter(
            (
                is_target
                & (F.col("b0") >= 0)
                & (F.col("cb") <= F.col("tg.rank"))
                & (F.col("tg.rank") < F.col("cb") + F.col("cnt"))
            )
            | (~is_target & (F.col("rn1") == 1) & (F.col("tg.which") == 0))
        )
        .select(
            "__vk",
            "__vci",
            "name",
            "t",
            "tg.which",
            (F.col("tg.rank") - F.col("cb")).alias("rib"),
            "cnt",
            "b0",
        )
        .localCheckpoint(eager=True)
    )
    universe = located.filter(F.col("name").isNull()).select("__vk")
    pending = located.filter(F.col("name").isNotNull())

    resolved_parts: list[DataFrame] = []
    path = ["b0"]
    for level in range(LEVELS):
        # stat read over the (checkpointed, tiny) located relation:
        # two scalars decide refinement and broadcast strategy
        stat = pending.agg(F.max("cnt").alias("mx"), F.count("*").alias("cn")).collect()[0]
        bcast = (stat["cn"] or 0) <= _BROADCAST_TARGETS
        last = level == LEVELS - 1
        done = last or (stat["mx"] or 0) <= refine_cap
        small = pending if done else pending.filter(F.col("cnt") <= refine_cap)
        resolved_parts.append(_resolve(v, small, path, bcast))
        if done:
            break

        # refine: one extra pass — sub-histogram only inside the
        # oversized parent buckets (tiny broadcast ``parents``), then
        # re-locate each pending rank within its parent via the
        # cumulative window over the next path column
        bcol = f"b{level + 1}"
        big = pending.filter(F.col("cnt") > refine_cap).drop("cnt")
        parents = big.select("__vk", "__vci", *path).distinct()
        if bcast:
            parents = F.broadcast(parents)
        sub = (
            v.alias("v")
            .join(parents.alias("p"), _path_eq(path, "v", "p"))
            .groupBy(*[F.col(f"v.{c}") for c in ("__vk", "__vci", *path, bcol)])
            .agg(F.count("*").alias("cnt"))
        )
        w2 = Window.partitionBy("__vk", "__vci", *path).orderBy(bcol)
        sub = sub.withColumn(
            "cb",
            F.sum("cnt").over(
                w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("cnt"),
        )
        h = sub.select(
            F.col("__vk").alias("h_vk"),
            F.col("__vci").alias("h_ci"),
            *[F.col(c).alias(f"h_{c}") for c in path],
            F.col(bcol).alias(f"h_{bcol}"),
            "cnt",
            "cb",
        )
        cond = (
            F.col("__vk").eqNullSafe(F.col("h_vk"))
            & (F.col("__vci") == F.col("h_ci"))
            & (F.col("cb") <= F.col("rib"))
            & (F.col("rib") < F.col("cb") + F.col("cnt"))
        )
        for c in path:
            cond = cond & (F.col(c) == F.col(f"h_{c}"))
        pending = (
            big.join(h, cond)
            .select(
                "__vk",
                "__vci",
                "name",
                "t",
                "which",
                (F.col("rib") - F.col("cb")).alias("rib"),
                "cnt",
                *path,
                F.col(f"h_{bcol}").alias(bcol),
            )
            .localCheckpoint(eager=True)
        )
        path = path + [bcol]

    resolved = resolved_parts[0]
    for part in resolved_parts[1:]:
        resolved = resolved.unionByName(part)

    # assemble in ONE groupBy(group): pivot each target's lo/hi value
    # and position, then interpolate with Spark
    # Percentile.getPercentile's exact arithmetic — the two-sided
    # weighted form, lower value alone when the position is integral
    # (lo + (hi-lo)*frac is 1 ulp off this on some inputs; caught by
    # the high-cardinality equivalence test).
    def interp(n: str) -> Column:
        is_n = F.col("name") == n
        lo_v = F.max(F.when(is_n & (F.col("which") == 0), F.col("val")))
        hi_v = F.max(F.when(is_n & (F.col("which") == 1), F.col("val")))
        t = F.max(F.when(is_n, F.col("t")))
        lo_d = F.floor(t).cast("double")
        hi_d = F.ceil(t).cast("double")
        return (
            F.when(lo_d == hi_d, lo_v)
            .otherwise((hi_d - t) * lo_v + (t - lo_d) * hi_v)
            .alias(n)
        )

    wide = resolved.groupBy("__vk").agg(*[interp(n) for n in names])
    if bcast:
        wide = F.broadcast(wide)  # right build of the left join
    # all-NULL groups never produce a rank target; surface them with
    # NULL results via a left join from the checkpointed universe
    return (
        universe.alias("u")
        .join(wide.alias("w"), F.col("u.__vk").eqNullSafe(F.col("w.__vk")), "left")
        .select(F.col("u.__vk").alias(key), *[F.col(n) for n in names])
    )


def _resolve(v: DataFrame, small: DataFrame, path: list[str], bcast: bool) -> DataFrame:
    """Exact value lookup inside cap-sized rank-holding buckets:
    row_number over value order per needed bucket (v is first joined
    to the tiny broadcast needed-bucket set, so only rank-holding
    buckets are ever sorted), then a join picks the rank-holding row.
    Ties between duplicate values are rank-irrelevant: any order among
    equal values yields the same value at a given rank. Output:
    (__vk, name, which, t, val)."""
    need = small.select("__vk", "__vci", *path).distinct()
    if bcast:
        need = F.broadcast(need)
    rows = v.alias("v").join(need.alias("p"), _path_eq(path, "v", "p")).select(
        *[F.col(f"v.{c}") for c in ("__vk", "__vci", *path, "__pv")]
    )
    wv = Window.partitionBy("__vk", "__vci", *path).orderBy("__pv")
    ranked = rows.withColumn("rn", F.row_number().over(wv) - 1).select(
        F.col("__vk").alias("r_vk"),
        F.col("__vci").alias("r_ci"),
        *[F.col(c).alias(f"r_{c}") for c in path],
        "__pv",
        "rn",
    )
    cond = (
        F.col("__vk").eqNullSafe(F.col("r_vk"))
        & (F.col("__vci") == F.col("r_ci"))
        & (F.col("rn") == F.col("rib"))
    )
    for c in path:
        cond = cond & (F.col(c) == F.col(f"r_{c}"))
    small_j = F.broadcast(small) if bcast else small
    return small_j.join(ranked, cond).select(
        "__vk", "name", "which", "t", F.col("__pv").alias("val")
    )
