"""QA-suite queries (SURVEY.md sections 2.3 J11, 2.4 A3-A6, 2.7 U1)
— the reference's QA.sql reconciliation suite re-expressed on the
driver star schema. These both exercise operators and ARE the
engine's data-quality surface (qa.py wraps them for arbitrary star
schemas)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.io import load_tables
from clinical_data_warehouse_bi_spark.registry import register


@register("q_qa_orphan_report", oracle="""
    SELECT 'lineitem->orders' AS check_name, count(*) AS orphan_rows
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem->part', count(*)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_partkey IS NULL
    UNION ALL
    SELECT 'orders->customer', count(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'customer->nation', count(*)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'supplier->nation', count(*)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'nation->region', count(*)
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_regionkey IS NULL
    """)
def q_qa_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11/U1 — referential-integrity orphan probes (QA.sql:79-116):
    six LEFT JOIN ... IS NULL counts stacked with UNION ALL.

    Implemented as left_anti + count (same semantics, and the anti
    join never materializes matched rows). Dim side broadcast."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "part", "customer", "supplier", "nation", "region")
    )

    def probe(name: str, fact: DataFrame, fk: str, dim: DataFrame, key: str) -> DataFrame:
        orphans = fact.join(
            F.broadcast(dim), fact[fk] == dim[key], "left_anti"
        ).agg(F.count("*").alias("orphan_rows"))
        return orphans.select(F.lit(name).alias("check_name"), "orphan_rows")

    reports = [
        probe("lineitem->orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        probe("lineitem->part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        probe("orders->customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
        probe("customer->nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        probe("supplier->nation", t["supplier"], "s_nationkey", t["nation"], "n_nationkey"),
        probe("nation->region", t["nation"], "n_regionkey", t["region"], "r_regionkey"),
    ]
    return reduce(lambda a, b: a.unionByName(b), reports)


@register("q_qa_rowcount_report", oracle="""
    SELECT 'lineitem' AS table_name, count(*) AS total_rows,
           count(DISTINCT (l_orderkey, l_linenumber)) AS distinct_keys,
           count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS diff_rows
    FROM lineitem
    UNION ALL
    SELECT 'orders', count(*), count(DISTINCT o_orderkey),
           count(*) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'customer', count(*), count(DISTINCT c_custkey),
           count(*) - count(DISTINCT c_custkey) FROM customer
    UNION ALL
    SELECT 'part', count(*), count(DISTINCT p_partkey),
           count(*) - count(DISTINCT p_partkey) FROM part
    UNION ALL
    SELECT 'supplier', count(*), count(DISTINCT s_suppkey),
           count(*) - count(DISTINCT s_suppkey) FROM supplier
    UNION ALL
    SELECT 'nation', count(*), count(DISTINCT n_nationkey),
           count(*) - count(DISTINCT n_nationkey) FROM nation
    """)
def q_qa_rowcount_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F14/U1 — row-count reconciliation (QA.sql:13-59): per-table
    total vs distinct-key counts with a diff column (stage-vs-DWH
    dedup accounting in the reference).

    Scale shape: ONE job for all six tables. Each table projects just
    its key columns (conformed to an int tag + two bigints, so the
    shuffle rows are 20 bytes), the union flows through a single
    keyed aggregation (map-side partial dedup -> one exchange of
    distinct keys), and the per-table totals fall out of the same
    per-key counts. Replaces six separate full-table repartition
    jobs — same answers, one barrier, ~half the wall clock, and no
    driver-side partition probing."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "part", "supplier", "nation")
    )
    specs = [
        ("lineitem", t["lineitem"], ["l_orderkey", "l_linenumber"]),
        ("orders", t["orders"], ["o_orderkey"]),
        ("customer", t["customer"], ["c_custkey"]),
        ("part", t["part"], ["p_partkey"]),
        ("supplier", t["supplier"], ["s_suppkey"]),
        ("nation", t["nation"], ["n_nationkey"]),
    ]
    parts = []
    for i, (name, df, keys) in enumerate(specs):
        k1 = F.col(keys[0]).cast("bigint").alias("k1")
        k2 = (F.col(keys[1]) if len(keys) > 1 else F.lit(0)).cast("bigint").alias("k2")
        parts.append(df.select(F.lit(i).cast("int").alias("tag"), k1, k2))
    allk = reduce(lambda a, b: a.unionByName(b), parts)
    per_key = allk.groupBy("tag", "k1", "k2").agg(F.count("*").alias("c"))
    rep = per_key.groupBy("tag").agg(
        F.sum("c").cast("bigint").alias("total_rows"),
        F.count("*").alias("distinct_keys"),
    )
    name_expr = F.element_at(
        F.array(*[F.lit(name) for name, _, _ in specs]), F.col("tag") + 1
    )
    return rep.select(
        name_expr.alias("table_name"),
        "total_rows",
        "distinct_keys",
        (F.col("total_rows") - F.col("distinct_keys")).alias("diff_rows"),
    )


@register("q_qa_agg_consistency", oracle="""
    WITH agg AS (SELECT l_orderkey, count(*) AS total_events
                 FROM lineitem GROUP BY l_orderkey)
    SELECT (SELECT count(*) FROM lineitem) AS fact_rows,
           (SELECT CAST(sum(total_events) AS BIGINT) FROM agg) AS agg_total,
           (SELECT count(*) FROM lineitem)
             - (SELECT CAST(sum(total_events) AS BIGINT) FROM agg) AS diff
    """)
def q_qa_agg_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/F14 — fact-vs-aggregate consistency (QA.sql:67-71):
    COUNT(*) of the fact == SUM(total_events) of the pre-agg table;
    expected diff 0."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("total_events"))
    fact_rows = li.agg(F.count("*").alias("fact_rows"))
    agg_total = agg.agg(F.sum("total_events").cast("bigint").alias("agg_total"))
    return fact_rows.crossJoin(agg_total).select(
        "fact_rows",
        "agg_total",
        (F.col("fact_rows") - F.col("agg_total")).alias("diff"),
    )
