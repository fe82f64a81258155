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


def test_ranks_sum_to_one(spark):
    rng = random.Random(7)
    n = 25
    edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    got = _spark_pagerank(spark, n, edge_list)
    assert abs(sum(got.values()) - 1.0) < 1e-8


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
