"""A/B probe: top_ngrams' per-window hashing as JVM codegen exprs vs
a vectorized Arrow (pandas/numpy) stage (round-16 verdict item 4,
guide §4.2 "hand whole batches to vectorized native libraries").

The r12/r14 records show top_ngrams' cost is MAP-SIDE hashing (3
xxhash64-element evaluations per window after the prefilter), not the
slim exchange. The Arrow variant replaces both corpus passes:

- count pass: mapInPandas — tokenize per batch (pandas str ops), hash
  every token once (pandas hash_pandas_object, C siphash), combine
  each window's n token hashes with a vectorized uint64
  polynomial+splitmix finalizer (numpy, no per-window string, no
  per-window Python), partial-count per task via np.unique, emit slim
  (h1, h2, cnt) partials; the JVM aggregation sums vocabulary-sized
  partials only.
- recovery pass: same hashing, np.isin against the driver-collected
  candidate h1 set, strings built ONLY for surviving windows.

The gram identity changes from xxhash64(elements) to the mixed token
hashes — grouping semantics are identical modulo 128-bit collisions
(the accepted hazard budget), and the REPORT (ngram, n_occ, n_docs)
is checked row-for-row between arms.

Protocol: alternating A (JVM, current) / B (Arrow), best-of-N after a
discarded warm-up, exact row equality asserted. ``factor`` replicates
the documents table with shifted doc ids (the bench_scaling
construction) to probe the 10M+-window regime where the JVM literal
prefilter was measured (78 -> 10.4 s at 256x, r12).

Usage: python scripts/bench_topngrams_arrow.py [sf_dir] [factor] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import text as T
from clinical_data_warehouse_bi_spark.io import fan_out, read_table
from clinical_data_warehouse_bi_spark.session import get_spark

NGRAM_N = 3
NGRAM_K = 100

# -- vectorized hashing core (shared by both Arrow passes) ----------

_P1 = 0x9E3779B97F4A7C15
_P2 = 0xC2B2AE3D27D4EB4F


def _win_hashes(th, n):
    """Two independent 64-bit window hashes from per-token hashes:
    uint64 polynomial roll + splitmix64-style finalizer, fully
    vectorized. th: uint64 ndarray of token hashes. Returns (h1, h2)
    uint64 ndarrays of length len(th) - n + 1 (callers mask doc
    boundaries)."""
    import numpy as np

    def roll(mult, xor_seed):
        m = np.uint64(mult)
        acc = th[: len(th) - n + 1] ^ np.uint64(xor_seed)
        for j in range(1, n):
            acc = acc * m + th[j : len(th) - n + 1 + j]
        # splitmix64 finalizer for diffusion
        z = acc
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return z

    return roll(_P1, 0), roll(_P2, 0x6A09E667F3BCC908)


def _tokenize_flat(texts):
    """(flat token object-array, per-doc lengths int64) for a pandas
    Series of texts — pandas/C tokenization, one Python-level flatten."""
    import itertools

    import numpy as np

    toks = texts.str.lower().str.findall("[a-z0-9]+")
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    total = int(lens.sum())
    flat = np.fromiter(
        itertools.chain.from_iterable(toks), dtype=object, count=total
    )
    return flat, lens


def _window_mask(lens, n):
    """Boolean mask over window start positions (flat indexing):
    True iff the window does not cross a document boundary."""
    import numpy as np

    total = int(lens.sum())
    if total < n:
        return np.zeros(max(total - n + 1, 0), dtype=bool)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return doc_of[: total - n + 1] == doc_of[n - 1 :]


def _count_pass(it: Iterator) -> Iterator:
    import numpy as np
    import pandas as pd

    parts = []
    for pdf in it:
        flat, lens = _tokenize_flat(pdf["text"])
        if len(flat) < NGRAM_N:
            continue
        th = pd.util.hash_pandas_object(
            pd.Series(flat, dtype=object), index=False
        ).to_numpy()
        h1, h2 = _win_hashes(th, NGRAM_N)
        mask = _window_mask(lens, NGRAM_N)
        parts.append(np.stack([h1[mask], h2[mask]], axis=1))
    if parts:
        import numpy as np

        allw = np.concatenate(parts)
        # one partial count per task: unique over the (h1, h2) rows
        v = np.ascontiguousarray(allw).view([("a", "<u8"), ("b", "<u8")])
        uniq, cnt = np.unique(v, return_counts=True)
        yield pd.DataFrame(
            {
                "h1": uniq["a"].view(np.int64),
                "h2": uniq["b"].view(np.int64),
                "cnt": cnt.astype(np.int64),
            }
        )


def _recovery_pass(cand_h1):
    def op(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cand = np.asarray(cand_h1, dtype=np.int64).view(np.uint64)
        for pdf in it:
            flat, lens = _tokenize_flat(pdf["text"])
            if len(flat) < NGRAM_N:
                continue
            th = pd.util.hash_pandas_object(
                pd.Series(flat, dtype=object), index=False
            ).to_numpy()
            h1, h2 = _win_hashes(th, NGRAM_N)
            mask = _window_mask(lens, NGRAM_N)
            hit = mask & np.isin(h1, cand)
            idx = np.nonzero(hit)[0]
            if len(idx) == 0:
                continue
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), lens)
            yield pd.DataFrame(
                {
                    "__id": doc_ids[idx],
                    "ngram": [
                        " ".join(flat[i : i + NGRAM_N]) for i in idx
                    ],
                    "h1": h1[idx].view(np.int64),
                    "h2": h2[idx].view(np.int64),
                }
            )

    return op


def top_ngrams_arrow(docs: DataFrame, n: int = NGRAM_N, k: int = NGRAM_K) -> DataFrame:
    assert n == NGRAM_N  # probe hardcodes the registered parameters
    spark = docs.sparkSession
    schema = "ngram string, n_occ bigint, n_docs bigint"
    counts = (
        docs.select("text")
        .mapInPandas(_count_pass, "h1 long, h2 long, cnt long")
        .groupBy("h1", "h2")
        .agg(F.sum("cnt").alias("n_occ"))
        .persist()
    )
    try:
        kth_rows = (
            counts.select("n_occ")
            .orderBy(F.col("n_occ").desc())
            .limit(k)
            .agg(F.min("n_occ"))
            .collect()
        )
        kth = kth_rows[0][0]
        if kth is None:
            return spark.createDataFrame([], schema)
        cand = counts.where(F.col("n_occ") >= int(kth))
        h1s = [r["h1"] for r in cand.select("h1").collect()]
        rows = (
            docs.select("doc_id", "text")
            .mapInPandas(
                _recovery_pass(h1s), "__id long, ngram string, h1 long, h2 long"
            )
            .join(F.broadcast(cand), ["h1", "h2"])
            .groupBy("ngram")
            .agg(
                F.first("n_occ").alias("n_occ"),
                F.count_distinct("__id").alias("n_docs"),
            )
            .orderBy(F.col("n_occ").desc(), F.col("ngram").asc())
            .limit(k)
            .select("ngram", "n_occ", "n_docs")
            .collect()
        )
    finally:
        counts.unpersist()
    return spark.createDataFrame(rows, schema)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench-topngrams-arrow")
    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    if factor > 1:
        mx = base.agg(F.max("doc_id")).collect()[0][0] + 1
        docs = base
        for r in range(1, factor):
            docs = docs.unionAll(
                base.select(
                    (F.col("doc_id") + F.lit(r * mx)).alias("doc_id"), "text"
                )
            )
    else:
        docs = base

    def run_a():
        return T.top_ngrams(fan_out(docs), n=NGRAM_N, k=NGRAM_K)

    def run_b():
        return top_ngrams_arrow(fan_out(docs))

    ra = [tuple(r) for r in run_a().collect()]
    rb = [tuple(r) for r in run_b().collect()]
    print(f"rows A={len(ra)} B={len(rb)} equal={ra == rb}")
    if ra != rb:
        for x, y in zip(ra, rb):
            if x != y:
                print("DIFF", x, y)
        raise SystemExit("arms diverge — abort")

    times = {"A_jvm": [], "B_arrow": []}
    for rnd in range(n_rounds + 1):
        for name, fn in (("A_jvm", run_a), ("B_arrow", run_b)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if rnd > 0:
                times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s factor={factor}", flush=True)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
