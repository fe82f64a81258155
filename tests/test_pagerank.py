"""PageRank (graph.py): checked against an independent numpy power
iteration (same damped + dangling-redistribution semantics) on
random and hand-built graphs."""

from __future__ import annotations

import random

import numpy as np
import pytest

from clinical_data_warehouse_bi_spark.graph import pagerank

D = 0.85


def _numpy_pagerank(n, edge_list, d=D, iters=300):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[t] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return r


def _spark_pagerank(spark, n, edge_list, **kw):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = pagerank(e, vertices=v, tol=1e-9, max_iter=80, **kw)
    return {r["id"]: r["rank"] for r in out.collect()}


@pytest.mark.slow
def test_matches_numpy_on_random_graph(spark):
    rng = random.Random(42)
    n = 40
    edge_list = list({
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    })
    # a few guaranteed dangling + isolated vertices
    edge_list = [(s, t) for s, t in edge_list if s not in (37, 38, 39)]
    got = _spark_pagerank(spark, n, edge_list)
    want = _numpy_pagerank(n, edge_list)
    assert len(got) == n
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-7, (i, got[i], want[i])


@pytest.mark.slow
def test_ranks_sum_to_one(spark):
    rng = random.Random(7)
    n = 25
    edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    got = _spark_pagerank(spark, n, edge_list)
    assert abs(sum(got.values()) - 1.0) < 1e-8


@pytest.mark.slow
def test_hand_checked_triangle_with_sink(spark):
    # 0 -> 1 -> 2 -> 0 plus 2 -> 3 (3 is a dangling sink)
    edge_list = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = _spark_pagerank(spark, 4, edge_list)
    want = _numpy_pagerank(4, edge_list)
    for i in range(4):
        assert abs(got[i] - want[i]) < 1e-7
    # the cycle members outrank the sink's feeder share
    assert got[1] > got[3]


def test_converges_and_reports_stats(spark):
    edge_list = [(0, 1), (1, 0)]
    e = spark.createDataFrame(edge_list, "src long, dst long")
    stats = {}
    out = pagerank(e, tol=1e-10, max_iter=50, stats=stats)
    ranks = {r["id"]: r["rank"] for r in out.collect()}
    assert stats["converged"] is True
    assert stats["iterations"] < 50
    # symmetric 2-cycle: exactly 0.5 each
    assert abs(ranks[0] - 0.5) < 1e-9 and abs(ranks[1] - 0.5) < 1e-9


def test_max_iter_cutoff_flags_not_converged(spark):
    rng = random.Random(3)
    n = 30
    edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    e = spark.createDataFrame(edge_list, "src long, dst long")
    stats = {}
    out = pagerank(e, tol=1e-15, max_iter=2, stats=stats)
    assert out.count() > 0
    assert stats == {"iterations": 2, "converged": False}


def test_rejects_bad_damping(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


def _duck_pagerank_sql(n_iters: int, d: float = D) -> str:
    """Unrolled fixed-iteration damped power iteration in portable
    SQL (same dangling-redistribution semantics as graph.pagerank):
    each iteration is a contribution join-aggregate plus a dangling
    scalar, chained as CTEs r1..rN off the deterministic edge
    relation derived from orders."""
    head = f"""
    WITH e AS (SELECT DISTINCT (o_custkey % 97) AS s, (o_orderkey % 89) AS d
               FROM orders),
    v AS (SELECT DISTINCT id FROM
            (SELECT s AS id FROM e UNION SELECT d FROM e) u),
    nv AS (SELECT count(*)::DOUBLE AS n FROM v),
    deg AS (SELECT s, count(*)::DOUBLE AS od FROM e GROUP BY s),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM v)"""
    its = []
    for k in range(1, n_iters + 1):
        p = f"r{k - 1}"
        its.append(f""",
    c{k} AS (SELECT e.d AS id, sum(r.rank / deg.od) AS contrib
             FROM e JOIN {p} r ON r.id = e.s
                    JOIN deg ON deg.s = e.s
             GROUP BY e.d),
    dg{k} AS (SELECT coalesce(sum(r.rank), 0) AS dang
              FROM {p} r LEFT JOIN deg ON deg.s = r.id
              WHERE deg.s IS NULL),
    r{k} AS (SELECT v.id,
                    (1 - {d}) / (SELECT n FROM nv)
                    + {d} * (coalesce(c{k}.contrib, 0)
                             + (SELECT dang FROM dg{k}) / (SELECT n FROM nv))
                      AS rank
             FROM v LEFT JOIN c{k} ON c{k}.id = v.id)""")
    return head + "".join(its) + f"\n    SELECT id, rank FROM r{n_iters}"


def test_matches_duckdb_on_orders_graph(spark, duck, sf_dir):
    """Cross-ENGINE pin beyond the numpy twin (round-9 verdict #7):
    5 damped iterations over a deterministic graph derived from the
    driver's orders table must match a DuckDB unrolled
    power-iteration recomputation per vertex. tol=0 forces exactly
    max_iter iterations on the Spark side so both engines run the
    same fixed-point prefix."""
    from pyspark.sql import functions as F

    from clinical_data_warehouse_bi_spark.io import read_table

    o = read_table(spark, sf_dir, "orders")
    e = o.select(
        (F.col("o_custkey") % 97).cast("long").alias("src"),
        (F.col("o_orderkey") % 89).cast("long").alias("dst"),
    ).distinct()
    got = {
        r["id"]: r["rank"]
        for r in pagerank(e, damping=D, max_iter=5, tol=0.0).collect()
    }
    want = dict(duck.execute(_duck_pagerank_sql(5)).fetchall())
    assert set(got) == set(want) and len(got) > 50
    for i, w in want.items():
        assert abs(got[i] - w) < 1e-9, (i, got[i], w)
    assert abs(sum(got.values()) - 1.0) < 1e-8
