"""Routed graph-ANN recall curve at 64 cells on the REAL embeddings
table (round-16 verdict item 8): for each probe_clusters setting,
measure recall@10 vs exact cosine, the probed-shard fraction, the
distance-evaluation budget, and wall time — the measured trajectory
behind the 100 TB routing claim (probe a constant number of cells as
the corpus's cell count grows; recall is the dial).

Usage: python scripts/bench_hnsw_recall_curve.py [sf_dir] [n_clusters]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from clinical_data_warehouse_bi_spark import hnsw
from clinical_data_warehouse_bi_spark.io import read_table
from clinical_data_warehouse_bi_spark.session import get_spark

K = 10
N_QUERIES = 24


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("hnsw-recall-curve")
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    xn = x / nrm

    # deterministic query sample across the id range
    qpos = np.linspace(0, len(ids) - 1, N_QUERIES).astype(int)
    queries = [(int(ids[p]), [float(v) for v in x[p]]) for p in qpos]
    truth = {}
    for p in qpos:
        sims = xn @ xn[p]
        order = np.lexsort((ids, -np.round(sims, 9)))[:K]
        truth[int(ids[p])] = set(int(ids[i]) for i in order)

    path = os.path.join(
        tempfile.gettempdir(), f"hnsw_curve_{n_clusters}c"
    )
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    meta = hnsw.build_routed_hnsw_index(
        emb, path, n_clusters=n_clusters, m=12
    )
    build_sec = round(time.time() - t0, 2)

    graph = spark.read.parquet(path)
    curve = []
    probes = [p for p in (1, 2, 4, 8, 16, 32, n_clusters) if p <= n_clusters]
    for probe in probes:
        qbs = hnsw.route_queries(meta, queries, probe)
        t0 = time.time()
        got = hnsw.hnsw_routed_search(
            spark, path, queries, K, probe_clusters=probe
        ).collect()
        wall = round(time.time() - t0, 3)
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(by_q.get(qid, set()) & t) / K for qid, t in truth.items()
        ]
        evals = 0
        seen = set()
        for r in hnsw.shard_search(
            graph.where(hnsw.F.col("shard").isin(sorted(qbs))),
            queries, K, queries_by_shard=qbs,
        ).collect():
            pair = (r["shard"], r["query_id"])
            if pair not in seen:
                seen.add(pair)
                evals += r["n_evals"]
        curve.append({
            "probe_clusters": probe,
            "probe_fraction": round(probe / n_clusters, 4),
            "recall_mean": round(float(np.mean(recalls)), 4),
            "recall_min": round(float(np.min(recalls)), 4),
            "total_evals": int(evals),
            "evals_per_query": round(evals / len(queries), 1),
            "wall_sec": wall,
        })
        print(json.dumps(curve[-1]), file=sys.stderr)
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_vectors": int(len(ids)),
        "n_clusters": n_clusters,
        "n_shards": meta["n_shards"],
        "k": K,
        "n_queries": N_QUERIES,
        "build_sec": build_sec,
        "curve": curve,
        "host_load_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
