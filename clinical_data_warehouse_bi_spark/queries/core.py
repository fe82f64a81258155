"""Core relational queries: scans, projection/filter/cleansing,
aggregation, windows, sorts, unions (SURVEY.md sections 2.1-2.8)
realized on the driver's star schema per FIXTURES.md section C.

Every query here has a DuckDB oracle; aliases match exactly on both
sides (driver sorts columns by name before value-hashing).

Determinism rules used throughout (100 TB notes inline):
- Never hash-compare raw double ARITHMETIC: cast money inputs to
  decimal first (exact, associative) so Spark's parallel partial aggs
  and DuckDB's serial sums agree bit-for-bit.
- LIMIT/row_number only over total orders (unique tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import cleanse
from clinical_data_warehouse_bi_spark.io import fan_out, load_tables
from clinical_data_warehouse_bi_spark.registry import register

# ---------------------------------------------------------------------------
# Flagship: the reference's pre-aggregation table
# ---------------------------------------------------------------------------


#: q_agg_per_order's DuckDB oracle, preserved after its round-9
#: registry retirement (slot went to q_pivot_report, named a ready
#: candidate in SURVEY.md's round-9 log; witness: q_pricing_summary
#: keeps the A1/A2 group-aggregate + COUNT(DISTINCT) machinery under
#: the hash gate on the same lineitem grain — the per-admission
#: collect_set form itself keeps this full cross-engine value check
#: live in tests/test_retired_parity.py, and the query stays in the
#: bench set / 64x scale probes for historical comparability).
SQL_AGG_PER_ORDER = """
    SELECT l_orderkey AS admission_id,
           count(*) AS total_events,
           count(DISTINCT l_partkey) AS distinct_concepts,
           count(DISTINCT l_returnflag) AS distinct_sources
    FROM lineitem
    GROUP BY l_orderkey
    """


def q_agg_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — `agg_disorders_per_admission` (DWH.sql:203-210):
    COUNT(*) + 2x COUNT(DISTINCT) grouped by admission, mapped to
    lineitem-per-order.

    Scale: the distinct counts are computed as size(collect_set(..)),
    NOT countDistinct — countDistinct x2 plans an Expand (3x row
    blowup) plus two extra exchanges, while collect_set needs ONE
    shuffle on the group key (keyed fan_out pre-partitions, so the
    agg runs in place with no separate partial phase). The set per
    group is bounded by events-per-admission (small by the data's
    grain), so state stays tiny; for unbounded-cardinality groups use
    countDistinct (Expand) or approx_count_distinct instead.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        fan_out(li, "l_orderkey")
        .groupBy(F.col("l_orderkey").alias("admission_id"))
        .agg(
            F.count("*").alias("total_events"),
            F.size(F.collect_set("l_partkey")).cast("bigint").alias("distinct_concepts"),
            F.size(F.collect_set("l_returnflag")).cast("bigint").alias("distinct_sources"),
        )
    )


@register("q_pricing_summary", oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           count(*) AS count_order,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: group-by + multi-agg with
    arithmetic (A-class + F14). Inputs cast to decimal so parallel
    partial aggregation is exact and order-insensitive (double sums
    are not associative -> would not survive a 1000-executor re-plan).

    The exact decimal sum is converted decimal->string->double: both
    engines parse decimal strings correctly-rounded, whereas DuckDB's
    direct decimal->double conversion can be 1 ulp off Spark's.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")

    def exact_double(c):
        return c.cast("string").cast("double")

    # countDistinct(l_orderkey) alongside the sums would plan an
    # Expand (2x row blowup) + an extra exchange. Round-13 rewrite
    # (the earlier two-phase form aggregated EVERYTHING at
    # (flag, status, orderkey) grain, shipping every raw row with its
    # decimals through one full-width exchange — 11.4x DuckDB at
    # 256x): split the two concerns so neither pays a row-scale
    # exchange.
    # - sums leg: direct groupBy over the SIX (flag, status) groups —
    #   map-side partial aggregation collapses each task to <=6 rows
    #   of decimal state, so the exchange is partitions x 6 rows.
    # - distinct leg: map-side partial DEDUP of the slim
    #   (flag, status, orderkey) triple (no decimals; lineitem is
    #   naturally clustered by orderkey, so per-task dedup already
    #   collapses the ~4-7 lines per order), then count per group.
    # The two 6-row aggregates meet in a broadcast join. Decimal
    # addition is exact and associative, so the direct two-level sum
    # is value-identical under any partitioning (100 TB safe); the
    # second scan reads only 3 pruned columns.
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    sums = filtered.groupBy("l_returnflag", "l_linestatus").agg(
        exact_double(F.sum(F.col("l_quantity").cast("decimal(12,2)"))).alias("sum_qty"),
        exact_double(F.sum(price)).alias("sum_base_price"),
        exact_double(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
        exact_double(
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
        ).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )
    orders = (
        filtered.select("l_returnflag", "l_linestatus", "l_orderkey")
        .distinct()
        .groupBy(
            F.col("l_returnflag").alias("o_rf"),
            F.col("l_linestatus").alias("o_ls"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    # null-safe join: GROUP BY keeps NULL groups in both engines, so
    # the leg merge must too (equality keys would silently drop a
    # NULL-valued flag/status group — not present in this data, but
    # the join form should not depend on that)
    return sums.join(
        F.broadcast(orders),
        F.col("l_returnflag").eqNullSafe(F.col("o_rf"))
        & F.col("l_linestatus").eqNullSafe(F.col("o_ls")),
    ).select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "count_order", "n_orders",
    )


#: relative standard deviation for q_pricing_approx's HLL sketch; the
#: accuracy pytest pins |approx - exact| <= 3 * rsd * exact per group
PRICING_APPROX_RSD = 0.05


@register("q_pricing_approx")  # rows-only BY DESIGN: HLL sketches are
# engine-specific (Spark HLL++ vs DuckDB's own HLL give different
# estimates on identical data), so no portable SQL twin exists; the
# accuracy contract is the pinned 3-sigma-vs-exact pytest
# (tests/test_pricing_approx.py) and the exact columns stay
# hash-checked through q_pricing_summary, whose sums leg this shares.
def q_pricing_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_pricing_summary's AT-SCALE twin (round-13 verdict item 5):
    the exact COUNT(DISTINCT l_orderkey) is the measured terminal
    residue of the exact form (13.7 of 19.8 s at 256x is the
    distinct-triple exchange itself), so the 100 TB answer replaces
    it with approx_count_distinct — HLL++ partial sketches merge
    map-side like any other aggregate, so the WHOLE query is ONE
    aggregation over the six (flag, status) groups: no Expand, no
    second scan, no distinct leg, an exchange of partitions x 6
    sketch rows. This generalizes the reference's two COUNT(DISTINCT)
    aggregates (DWH.sql:207-208) the way production BI serves them at
    scale: exact decimal sums + sketched distinct counts, with the
    sketch error pinned (<= 3 * rsd, tests/test_pricing_approx.py).
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")

    def exact_double(c):
        return c.cast("string").cast("double")

    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return filtered.groupBy("l_returnflag", "l_linestatus").agg(
        exact_double(F.sum(F.col("l_quantity").cast("decimal(12,2)"))).alias("sum_qty"),
        exact_double(F.sum(price)).alias("sum_base_price"),
        exact_double(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
        exact_double(
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
        ).alias("sum_charge"),
        F.count("*").alias("count_order"),
        F.approx_count_distinct("l_orderkey", PRICING_APPROX_RSD).alias(
            "n_orders_approx"
        ),
    )


#: hi/lo accumulator split for pricing_summary_bucketed's level-2
#: bigint sums: per-order fixed-point values v (<= ~4e15 at e10
#: scale) are summed as (sum(v div S), sum(v mod S)) with S = 1e8 so
#: NEITHER leg can overflow a bigint until ~9e10 orders per
#: (flag, status) group — TPC-H SF 100k (~100 TB) has ~2.5e10 per
#: group, a 3.7x margin. The split is exact for any sign (Spark's
#: div/% satisfy v == (v div S)*S + (v mod S)).
PRICING_E_SPLIT = 100_000_000


def write_pricing_layout(
    li: DataFrame, table: str = "lineitem_by_order", num_buckets: int = 32
) -> None:
    """One-time M8 layout for the pricing workload: lineitem bucketed
    (and bucket-sorted) by l_orderkey — the Spark analog of the
    reference's fact B-tree indexes (DWH.sql:193-198) applied to its
    headline aggregate (DWH.sql:203-210). Paid once at write time;
    every COUNT(DISTINCT l_orderkey)-shaped aggregation then runs
    WITHOUT a row-scale exchange (see pricing_summary_bucketed)."""
    from clinical_data_warehouse_bi_spark.io import write_bucketed_table

    spark = li.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior write can leave the managed location behind with
    # no catalog entry — saveAsTable then refuses the name; clear it
    loc = (
        spark.conf.get("spark.sql.warehouse.dir")
        .removeprefix("file:")
        .rstrip("/")
    )
    import shutil

    shutil.rmtree(f"{loc}/{table}", ignore_errors=True)
    write_bucketed_table(
        li, table, ["l_orderkey"], num_buckets=num_buckets,
        sort_by=["l_orderkey"],
    )


def pricing_summary_bucketed(
    spark: SparkSession, table: str = "lineitem_by_order"
) -> DataFrame:
    """q_pricing_summary's EXACT at-scale form over the bucketed
    layout (round-16 verdict item 1): value-identical output (pinned
    by tests/test_pricing_approx.py) with ZERO row-scale exchange.

    Why the parquet form is terminal: the exact
    COUNT(DISTINCT l_orderkey) must materialize the distinct
    (flag, status, orderkey) set across partitions — a ~n_orders-row
    exchange that measured 13.7 of 19.8 s at 256x (BASELINE.md). The
    bucketed table is hash-partitioned by l_orderkey, so a two-level
    aggregation needs no exchange at all at the order grain:

    - level 1 groups by (flag, status, orderkey): HashPartitioning
      (l_orderkey) satisfies the clustering requirement (orderkey is
      a subset of the grouping keys), so Catalyst plans the aggregate
      directly on the scan — each order's lines are co-located by
      construction.
    - level 2 groups the ~n_orders level-1 rows by (flag, status):
      partial aggregation collapses each task to <= 6 rows before the
      only exchange (partitions x 6 rows).

    Exactness without decimal accumulation: measures are quantized to
    fixed-point BIGINTs at the same decimal casts the exact form uses
    (qty/price e2, discounted e6, charge e10 — products of the e-int
    forms are exactly the decimal products scaled), level-1 per-order
    sums are bounded (<= ~7 lines/order), and level-2 sums split
    hi/lo at PRICING_E_SPLIT so bigint never overflows (bounds on the
    constant). The final 6 rows reconstruct the decimal value and
    convert decimal->string->double exactly like the exact form, so
    the doubles are bit-identical. Bigint sum towers stay inside
    whole-stage codegen; the decimal ops run on 6 rows."""
    S = PRICING_E_SPLIT
    li = spark.table(table).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    lvl1 = (
        li.selectExpr(
            "l_returnflag",
            "l_linestatus",
            "l_orderkey",
            "cast(cast(l_quantity as decimal(12,2)) * 100 as bigint)"
            " AS qty_e2",
            "cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint)"
            " AS price_e2",
            "cast(cast(l_discount as decimal(6,4)) * 10000 as bigint)"
            " AS disc_e4",
            "cast(cast(l_tax as decimal(6,4)) * 10000 as bigint) AS tax_e4",
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "l_orderkey",
            "qty_e2",
            "price_e2",
            "price_e2 * (10000 - disc_e4) AS disc_e6",
            "price_e2 * (10000 - disc_e4) * (10000 + tax_e4) AS charge_e10",
        )
        .groupBy("l_returnflag", "l_linestatus", "l_orderkey")
        .agg(
            F.expr("sum(qty_e2)").alias("o_qty"),
            F.expr("sum(price_e2)").alias("o_price"),
            F.expr("sum(disc_e6)").alias("o_disc"),
            F.expr("sum(charge_e10)").alias("o_charge"),
            F.expr("count(*)").alias("o_lines"),
        )
    )
    hilo = [
        F.expr(f"sum({expr})").alias(f"{c}_{tag}")
        for c in ("o_qty", "o_price", "o_disc", "o_charge")
        for expr, tag in (
            (f"{c} div {S}", "hi"),
            (f"{c} % {S}", "lo"),
        )
    ]
    lvl2 = lvl1.groupBy("l_returnflag", "l_linestatus").agg(
        *hilo,
        F.expr("sum(o_lines)").alias("count_order"),
        F.expr("count(*)").alias("n_orders"),
    )

    def rebuild(c: str, divisor: str) -> str:
        # exact decimal reconstruction on 6 rows, then the shared
        # decimal->string->double conversion (correctly-rounded parse
        # in both engines — the q_pricing_summary convention). The
        # reconstructed integer re-casts to decimal(26,0) (bound 1e26
        # >> any total, ~1e19 at 100 TB) BEFORE the division: a
        # decimal(38,0) dividend trips Spark's precision-loss rule
        # (result precision 50 -> scale clipped to 6 < the e10 scale),
        # while 26+12 = 38 keeps the full scale — exact.
        return (
            f"cast(cast(cast(cast({c}_hi as decimal(38,0)) * {S} + {c}_lo"
            f" as decimal(26,0)) / {divisor} as string) as double)"
        )

    return lvl2.selectExpr(
        "l_returnflag",
        "l_linestatus",
        f"{rebuild('o_qty', '100')} AS sum_qty",
        f"{rebuild('o_price', '100')} AS sum_base_price",
        f"{rebuild('o_disc', '1000000')} AS sum_disc_price",
        f"{rebuild('o_charge', '10000000000')} AS sum_charge",
        "count_order",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Projection / filter / cleansing
# ---------------------------------------------------------------------------


#: q_keyword_filter's DuckDB oracle, preserved after its round-7
#: registry retirement so the cross-engine value check survives in
#: pytest (tests/test_retired_parity.py) even though the driver gate
#: no longer runs it.
SQL_KEYWORD_FILTER = """
    SELECT p_partkey, p_name, p_type FROM part
    WHERE lower(p_type) LIKE '%promo%'
       OR lower(p_type) LIKE '%economy%'
       OR lower(p_type) LIKE '%standard%'
    """


def q_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F2/F3 — OR-chain LIKE over lowered strings (the concept-dim
    keyword extract, Stage_area.sql:92-95). Predicate is folded and
    pushed toward the scan by Catalyst.

    Round-7 registry retirement (cap is 50; slot went to
    q_repetition_filter): hash-checked for six straight rounds with a
    frozen implementation; the pushdown shape stays plan-tested
    (tests/test_plans.py) and the full oracle comparison stays live in
    tests/test_retired_parity.py against SQL_KEYWORD_FILTER. Kept
    unregistered as the narrow-API form of P3/F2/F3."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return p.select("p_partkey", "p_name", "p_type").filter(
        cleanse.keyword_filter("p_type", ["promo", "economy", "standard"])
    )


def q_null_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P4 — project + rename + NULL-rejection in one pass
    (Stage_area.sql:27-29 `subject_id AS patient_id`, 183-185). One
    query carries all three trivial projection operators (registry cap
    consolidation: the former q_project_rename was this same
    select/alias shape on `customer`); column pruning + the NOT NULL
    predicates both reach the parquet scan.

    Round-5 registry retirement (cap is 50; the slot went to
    q_ann_ivf_learned): every operator here is strictly subsumed by
    q_multi_source_union's branches — each branch projects, renames
    (`l_orderkey AS source_id`), and NULL-rejects with the same
    pushdown-checked shapes, hash-verified against its oracle. Kept
    unregistered for the narrow-API form."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("props").isNotNull()
    ).select(
        F.col("event_id").alias("evt_id"),
        F.col("user_id").alias("patient_id"),
        F.col("ts").alias("event_ts"),
    )


@register("q_regex_numeric_parse", oracle="""
    WITH ex AS (
      SELECT event_id,
             regexp_extract(props, '"k":\\s*(-?[0-9]+(\\.[0-9]+)?)', 1) AS raw_value
      FROM events)
    SELECT event_id,
           CAST(CASE WHEN regexp_matches(raw_value, '^[0-9]+(\\.[0-9]+)?$')
                     THEN CAST(raw_value AS DECIMAL(10,2)) END AS DOUBLE) AS k_value
    FROM ex
    """)
def q_regex_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/M1/F4/F7 — regex-guarded numeric parse of a string field
    (Stage_area.sql:141-147: REGEXP gate then CAST AS DECIMAL(10,2)),
    applied to the JSON-ish `events.props`."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    raw = F.regexp_extract(F.col("props"), '"k":\\s*(-?[0-9]+(\\.[0-9]+)?)', 1)
    return ev.select(
        "event_id",
        cleanse.regex_guarded_numeric(raw, "decimal(10,2)").cast("double").alias("k_value"),
    )


#: q_sentinel_timestamps' DuckDB oracle, preserved after its round-9
#: registry retirement (slot went to q_repeated_spans, the round-8
#: verdict's item 6; witnesses: q_calendar_dim keeps the F-function
#: family under the hash gate and q_scalar_lookup_default the
#: COALESCE-default shape — the P7 CASE-sentinel expression itself
#: keeps this full cross-engine value check live in
#: tests/test_retired_parity.py).
SQL_SENTINEL_TIMESTAMPS = """
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  WHEN o_orderkey % 11 = 0 THEN ' '
                  ELSE CAST(o_orderdate AS VARCHAR) END AS raw_ts
      FROM orders)
    SELECT o_orderkey,
           CASE WHEN raw_ts IS NULL OR trim(raw_ts) = ''
                THEN TIMESTAMP '1900-01-01 00:00:00'
                ELSE CAST(raw_ts AS TIMESTAMP) END AS admit_ts,
           CAST(CASE WHEN raw_ts IS NULL OR trim(raw_ts) = ''
                     THEN TIMESTAMP '2999-12-31 23:59:59'
                     ELSE CAST(raw_ts AS TIMESTAMP) END AS VARCHAR) AS disch_ts
    FROM raw
    """


def q_sentinel_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F1/F5 — CASE WHEN NULL-or-blank -> sentinel timestamp else
    cast (Stage_area.sql:41-48, 62-69). The nullable/blank raw column
    is derived deterministically since driver data has no blank
    timestamps."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    raw = (
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("o_orderkey") % 11 == 0, F.lit(" "))
        .otherwise(F.col("o_orderdate").cast("string"))
    )
    base = o.select("o_orderkey", raw.alias("raw_ts"))
    return base.select(
        "o_orderkey",
        cleanse.sentinel_timestamp("raw_ts", cleanse.SENTINEL_LOW).alias("admit_ts"),
        cleanse.sentinel_timestamp("raw_ts", cleanse.SENTINEL_HIGH)
        .cast("string")
        .alias("disch_ts"),
    )


#: q_calendar_dim's DuckDB oracle, preserved after its round-12
#: registry retirement (slot went to q_benford per the round-11
#: verdict item 1) — the cross-engine value check survives in
#: tests/test_retired_parity.py.
SQL_CALENDAR_DIM = """
    SELECT event_datetime,
           month(event_datetime) AS month_num,
           year(event_datetime) AS year_num,
           isodow(event_datetime) AS weekday_num,
           dayname(event_datetime) AS day_name,
           monthname(event_datetime) AS month_name,
           dayofweek(event_datetime) IN (0, 6) AS is_weekend
    FROM (SELECT DISTINCT l_shipdate AS event_datetime FROM lineitem)
    """


def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9-F13/P6/A7 — the timestamp-grain dim_date build
    (Stage_area.sql:289-301): DISTINCT fact timestamps + derived
    calendar attributes. MariaDB WEEKDAY+1 == Spark weekday()+1 ==
    DuckDB isodow (1=Monday); MariaDB DAYOFWEEK(1=Sun..7=Sat) ==
    Spark dayofweek == DuckDB dayofweek+1.

    Round-12 registry retirement (cap is 50; the slot went to
    q_benford): hash-checked for eleven straight rounds on a frozen
    implementation. Witnesses: the star pipeline e2e builds the SAME
    cleanse.calendar_columns dim_date every round (value-anchored in
    tests/test_star_pipeline.py), and every F9-F13 calendar function
    stays cross-engine value-checked here via SQL_CALENDAR_DIM in
    tests/test_retired_parity.py plus the retired-parity F-family
    rows (q_sentinel_timestamps et al.)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    d = li.select(F.col("l_shipdate").alias("event_datetime")).distinct()
    return d.select(*cleanse.calendar_columns("event_datetime"))


# ---------------------------------------------------------------------------
# Distinct / duplicates / windows / top-k
# ---------------------------------------------------------------------------


SQL_DUP_PROBE = """
    SELECT o_custkey, count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR)
                AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    ORDER BY count(*) DESC, o_custkey LIMIT 10
    """


def q_dup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 + O1 — GROUP BY ... HAVING count(*)>1 duplicate detection
    (QA.sql:124-176) ranked to the top-10 offenders (LIMIT,
    Stage_area.sql:229; registry cap consolidation: the former
    q_topk_orders' ORDER BY + LIMIT now rides here). Deterministic
    total order (count desc, unique key tiebreak); Spark plans
    TakeOrderedAndProject — per-partition top-k then a k-row merge,
    no global sort at scale.

    Round-8 registry retirement (cap is 50; the slot went to
    q_lm_perplexity): hash-checked for seven straight rounds on a
    frozen implementation, and the designated fall-off candidate in
    the check-order's trivial tail since round 5. Witnesses: the
    HAVING>1 probe family runs live in the pipeline QA suite
    (qa.duplicate_*_probe, all-zero asserted e2e every round), and
    the TakeOrderedAndProject top-k shape is plan-locked in
    tests/test_plans.py. The full oracle comparison stays live in
    tests/test_retired_parity.py against SQL_DUP_PROBE."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("string")
            .cast("double")
            .alias("total_spend"),
        )
        .filter(F.col("n_orders") > 1)
        .orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
        .limit(10)
    )


SQL_SURROGATE_KEY = """
    SELECT row_number() OVER (ORDER BY s_suppkey) AS provider_id,
           s_name, s_nationkey
    FROM supplier
    """


def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — ROW_NUMBER() OVER () surrogate key (Stage_area.sql:58).
    Deterministic ORDER BY replaces MariaDB's insertion order. This
    global window single-partitions — correct for dimension tables
    only; fact keys use keys.distributed_key() at scale.

    Round-8 registry retirement (cap is 50; the slot went to
    q_funnel_steps): hash-checked for seven straight rounds on a
    frozen implementation. Witness: q_scd2_dim's registered oracle
    exercises the same ROW_NUMBER-over-ordered-window machinery (its
    version sequencing IS a per-key surrogate ordering), and the
    distributed-key variants keep their own property tests
    (tests/test_properties.py::test_zip_index_key_dense_unique). The
    full oracle comparison stays live in tests/test_retired_parity.py
    against SQL_SURROGATE_KEY."""
    from clinical_data_warehouse_bi_spark.keys import row_number_key

    s = load_tables(spark, sf_dir, ("supplier",))["supplier"]
    return s.select(
        row_number_key([F.col("s_suppkey")]).alias("provider_id"),
        "s_name",
        "s_nationkey",
    )


# ---------------------------------------------------------------------------
# Unions
# ---------------------------------------------------------------------------


@register("q_multi_source_union", oracle="""
    SELECT 'lineitem' AS event_source_type, l_orderkey AS source_id,
           l_shipdate AS event_ts, l_quantity AS measurement_value
    FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
    UNION ALL
    SELECT 'orders', o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
    UNION ALL
    SELECT 'events', event_id, CAST(ts AS TIMESTAMP), value
    FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL
    """)
def q_multi_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/P4/F15 — the three-branch conform-and-union fact build
    (Stage_area.sql:169-222: labs + diagnoses + OMR into one fact
    table, each branch NULL-rejected and tagged with a literal source
    type). Union is a no-shuffle narrow op in Spark."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "events"))
    a = (
        t["lineitem"]
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            F.lit("lineitem").alias("event_source_type"),
            F.col("l_orderkey").alias("source_id"),
            F.col("l_shipdate").alias("event_ts"),
            F.col("l_quantity").alias("measurement_value"),
        )
    )
    b = (
        t["orders"]
        .filter(F.col("o_orderkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.lit("orders").alias("event_source_type"),
            F.col("o_orderkey").alias("source_id"),
            F.col("o_orderdate").alias("event_ts"),
            F.col("o_totalprice").alias("measurement_value"),
        )
    )
    c = (
        t["events"]
        .filter(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.lit("events").alias("event_source_type"),
            F.col("event_id").alias("source_id"),
            F.col("ts").alias("event_ts"),
            F.col("value").alias("measurement_value"),
        )
    )
    return a.unionByName(b).unionByName(c)


# ---------------------------------------------------------------------------
# JSON extraction / approximate-distinct scale variants
# ---------------------------------------------------------------------------


@register("q_json_extract", oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction over `events.props` (the JSON-ish
    string column): get_json_object pulls `$.k`, then a plain grouped
    agg. The extraction is a JVM-side codegen expression evaluated in
    the scan stage — per-row, no shuffle; only the 5-group agg
    shuffles. For a fixed known schema at scale, from_json with an
    explicit StructType (one parse, many fields) beats repeated
    get_json_object calls."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sketch surface in one query (registry cap
    consolidation of the former q_agg_per_order_approx +
    q_percentiles_approx twins): per admission-group,
    approx_count_distinct (HyperLogLog++ — mergeable sketch, pure
    map-side partial agg, one tiny shuffle, no per-group set state)
    and approx_percentile (KLL/Greenwald-Khanna-style summary —
    mergeable, O(accuracy) state per group instead of O(group
    size)). No oracle: sketch estimates are engine-specific (driver
    records the rows-only check); q_agg_per_order and q_percentiles
    are the exact twins that ARE value-checked.

    RETIRED from the registry in round 9 (its slot went to the
    round-8 verdict's named oracle candidates): a rows-only entry
    carries no value evidence the pytest suite doesn't already —
    the registered exact twins stay under the hash gate, and
    tests/test_retired_parity.py now pins every sketch column here
    against its exact value within the sketches' published error
    bounds, which is STRONGER than the rows-only check the slot
    bought."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("total_events"),
        F.approx_count_distinct("l_orderkey").alias("approx_distinct_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_distinct_concepts"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("median_qty"),
        F.expr("approx_percentile(l_quantity, 0.95, 10000)").alias("p95_qty"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("median_price"),
    )


def exact_percentiles_bucketed(
    df: DataFrame,
    key: str,
    specs: dict[str, list[tuple[float, str]]],
    native_distinct_max: int = 65536,
) -> list[dict]:
    """EXACT interpolated percentiles per group, list-of-dicts API
    (DuckDB quantile_cont definition). Round-6: the round-3
    driver-merged implementation that lived here (per-group histogram
    counters merged in a Python loop — a known scale hazard at high
    group cardinality) is GONE; this is now a thin adapter over
    percentiles.exact_percentiles_distributed, which keeps state
    bounded on BOTH sides of the driver/executor split. The collect
    here is the caller's choice of materialization, not part of the
    algorithm — use the DataFrame form directly for anything large.

    Reference analogue: the BI summary surface (DWH.sql:203-210)."""
    from clinical_data_warehouse_bi_spark.percentiles import (
        exact_percentiles_distributed,
        release,
    )

    out_df = exact_percentiles_distributed(
        df, key, specs, native_distinct_max=native_distinct_max
    )
    names = [name for c in specs for _, name in specs[c]]
    try:
        return [
            {key: r[key], **{n: r[n] for n in names}} for r in out_df.collect()
        ]
    finally:
        release(out_df)


def percentiles_native_lowcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The low-cardinality fast path: Spark's `percentile` aggregate
    (== DuckDB `quantile_cont`: same linear-interpolation definition,
    bit-identical on the same data) in one shuffle-free-partial pass.
    Its merge state is a value->count map per group — bounded by
    DISTINCT values, so it is the right plan when the measured column
    is discrete (l_quantity: 50 values) and an executor-memory risk
    when it is continuous (l_extendedprice at 100 TB). Registered
    q_percentiles uses the bounded-state refinement instead;
    tests/test_properties.py proves the two bit-equal."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


@register("q_percentiles", oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group with BOUNDED state on
    BOTH sides of the driver/executor split — the registered default
    is percentiles.exact_percentiles_distributed (min/max probe ->
    4096-bucket histogram -> rank location via cumulative windows ->
    value counts only inside rank-holding buckets, ALL as DataFrame
    ops). Spark's native `percentile` buffers a value->count map per
    group — an executor-memory risk on continuous columns at 100 TB —
    and the round-3 bucketed form fixed that but merged per-group
    histograms on the driver, which breaks at high group cardinality;
    the distributed form's driver traffic is O(1) scalars, so the same
    plan serves 3 groups or 10 million (high-cardinality property
    test). Bit-equal to the native aggregate AND the DuckDB
    quantile_cont oracle; the native form stays available as
    percentiles_native_lowcard for discrete columns, and
    q_approx_stats carries the one-pass sketch twin.

    Reference analogue: the BI summary surface (DWH.sql:203-210)."""
    import os

    from clinical_data_warehouse_bi_spark.io import (
        parquet_num_rows,
        parquet_numeric_bounds,
    )
    from clinical_data_warehouse_bi_spark.percentiles import (
        exact_percentiles_distributed,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    path = os.path.join(sf_dir, "lineitem.parquet")
    # global min/max and the exact row count from the parquet
    # footers — driver metadata reads, no job (None -> probe runs).
    # Small inputs route to the single-job native aggregate (its
    # value->count buffers cannot OOM below the row gate); at scale
    # the bounded-state bucketed refinement runs as before.
    bounds = parquet_numeric_bounds(path, ["l_quantity", "l_extendedprice"])
    return exact_percentiles_distributed(
        li,
        "l_returnflag",
        {
            "l_quantity": [(0.5, "median_qty"), (0.95, "p95_qty")],
            "l_extendedprice": [(0.5, "median_price")],
        },
        bounds=bounds,
        n_rows=parquet_num_rows(path),
    )


SQL_GROUPED_PERCENTILES = """
    SELECT event_type,
           quantile_cont(value, 0.5)  AS q_0_5,
           quantile_cont(value, 0.9)  AS q_0_9,
           quantile_cont(value, 0.99) AS q_0_99
    FROM events GROUP BY event_type
    """


def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles PER GROUP via
    percentiles.grouped_percentiles — the grouped companion of the
    registered q_percentiles (which carries the bounded-state
    distributed refinement for ONE giant continuous group).

    Round-11 registry retirement (cap is 50; the slot went to
    q_outlier_report per the round-10 verdict item 4): witnesses are
    q_outlier_report itself — its median/MAD are window-partitioned
    per-group exact percentiles over the SAME JVM percentile
    aggregate, hash-checked value-for-value — and q_percentiles,
    which keeps the exact-percentile family's scale path registered.
    The full oracle comparison stays live in
    tests/test_retired_parity.py against SQL_GROUPED_PERCENTILES.

    Here the
    groups are plentiful and individually bounded (per event type),
    so Spark's exact JVM `percentile` aggregate — the same
    linear-interpolation definition as DuckDB's quantile_cont, hence
    bit-identical on the same doubles — is the right plan: ONE
    shuffle, per-group state proportional to that group's values on
    one executor. ``round_to=None`` keeps the raw bit-equal doubles
    for the hash compare (rounding is the one step whose last-ulp
    behaviour is engine-specific).

    Reference analogue: the BI summary surface (DWH.sql:203-210),
    generalised to arbitrary grouping columns."""
    from clinical_data_warehouse_bi_spark.percentiles import grouped_percentiles

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return grouped_percentiles(
        ev, ["event_type"], "value", [0.5, 0.9, 0.99], round_to=None
    )


#: stratified-sampling rates per event_type (training-mix shaping:
#: downsample the abundant strata, keep the rare ones whole)
SAMPLE_RATES = {
    "click": 0.05,
    "view": 0.10,
    "signup": 0.25,
    "error": 0.50,
    "purchase": 1.00,
}
_HASH_SPACE = 16 ** 7  # 7 md5 nibbles ~ uniform 28-bit hash

_SQL_NIBBLE_HASH = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), {i}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(1, 8)
)
_SQL_RATE_CASE = "CASE " + " ".join(
    f"WHEN event_type = '{t}' THEN {int(r * _HASH_SPACE)}"
    for t, r in SAMPLE_RATES.items()
) + " ELSE 0 END"


SQL_STRATIFIED_SAMPLE = f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_SQL_NIBBLE_HASH} < {_SQL_RATE_CASE}
    """


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-mix shaping
    op: keep each row iff uniform_hash(id) < rate(stratum), with
    per-stratum rates (downsample abundant event types, keep rare
    ones). Hash = first 7 md5 nibbles of the id (portable across
    engines, uniform, reproducible run-to-run and engine-to-engine —
    unlike rand() or TABLESAMPLE, the sample is STABLE, so downstream
    incremental jobs see a consistent subset). Pure per-row filter:
    no shuffle, scales linearly, and the predicate pushes to the
    scan.

    Round-8 registry retirement (cap is 50; the slot went to
    q_quota_sample — the sampling family's richer registered form,
    per-group capping with the same deterministic-md5-priority
    discipline): hash-checked for six straight rounds on a frozen
    implementation; the batch==stream set-equality test
    (tests/test_streaming.py) keeps the filter value-checked on real
    events, and the full oracle comparison stays live in
    tests/test_retired_parity.py against SQL_STRATIFIED_SAMPLE."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    u = F.expr(
        "cast(conv(substr(md5(cast(event_id as string)), 1, 7), 16, 10) as bigint)"
    )
    threshold = F.expr(_SQL_RATE_CASE)  # same CASE text parses in Spark SQL
    return ev.filter(u < threshold).select("event_id", "event_type")


@register("q_rollup", oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n_rows,
           CAST(sum(CAST(sign(l_quantity)
                         * floor(abs(l_quantity) * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level pre-aggregation: ROLLUP emits (flag, status),
    (flag), and grand-total grains — the hypertable-rollup /
    BI-summary-table pattern (the reference materializes one grain,
    DWH.sql:203-210; rollup gives the full lattice).

    Scale shape: rollup is computed over the PRE-AGGREGATED base
    grain, not the raw rows — count and decimal-sum re-aggregate
    exactly, so `ROLLUP` (physically an Expand = one duplicated row
    per grouping set) multiplies the 6-row base instead of the full
    table. Raw-row rollup Expands N x |grouping sets| rows through
    the shuffle; this shape holds at 100 TB for any re-aggregable
    measure (sums/counts/min/max — not medians). grouping_id
    disambiguates rollup-NULL from data-NULL.

    The measure sums LONG CENTS (round 13): per-row
    sign*floor(abs(q)*100 + 0.5) — the q_outlier_report z_e9
    quantization convention; floor/abs/sign on doubles have ONE
    defined IEEE result in both engines, the bigint sum is exact and
    associative (overflow headroom ~1.8e15 rows at q <= 50), and the
    final CAST(.. AS DOUBLE)/100.0 is the identical two-op sequence
    in the oracle — bit-identical by construction. Measured 3.2x
    over the decimal(12,2) accumulator at 256x (2.89 -> 0.90 s): the
    decimal sum was the whole gap to DuckDB, the scan costs 0.74 s."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = (
        F.signum("l_quantity")
        * F.floor(F.abs(F.col("l_quantity")) * 100 + F.lit(0.5))
    ).cast("bigint")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("c"),
        F.sum(cents).alias("s"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("c").cast("bigint").alias("n_rows"),
            (F.sum("s").cast("double") / F.lit(100.0)).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
    )
