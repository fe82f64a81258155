"""Sources / sinks / catalog ops (SURVEY.md section 2.1, S1-S7).

The reference's sources are full-table SQL scans of 8 MIMIC-IV tables
(Stage_area.sql:30,50,70,91,104,135,180,199) and its sinks are CTAS /
INSERT...SELECT into MariaDB tables. Spark-first mapping: parquet
scans (columnar, predicate pushdown, column pruning for free) and
parquet writes as the layer-materialization barriers.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: every table the driver materializes per scale factor (TESTDATA.md)
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: memo of (session, sf_dir, table) -> DataFrame. A parquet read pays
#: a file-listing + footer/schema pass (~0.1 s locally) on EVERY
#: spark.read call; the returned DataFrame is an immutable lazy plan,
#: so one per (session, path) serves every query. The stored session
#: is identity-checked on lookup so a recycled id() from a stopped
#: session can never leak a stale plan.
_TABLE_MEMO: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1 table scan: one parquet-backed table (lazy; Catalyst prunes
    columns and pushes predicates into the scan). Memoized per
    (session, dir, table) — see _TABLE_MEMO.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot map
    to its microsecond TimestampType; we read it as a raw nanosecond
    long and truncate to micros (exact: driver data has no sub-us
    precision, and DuckDB's view of the same file is also micros).
    """
    memo_key = (id(spark), sf_dir, name)
    cached = _TABLE_MEMO.get(memo_key)
    if cached is not None and cached[0] is spark:
        # NOTE: the memoized plan captured the file listing at first
        # read; driver testdata is immutable, but if a caller rewrites
        # the directory in-session it must pop the entry (or use a new
        # session) to see the new files
        return cached[1]
    # miss path only: evict entries of stopped sessions so a process
    # that cycles get_spark()/stop() does not pin dead sessions
    # forever. The liveness probe touches private py4j internals, so
    # a failing probe (API drift, half-torn-down session) counts as
    # dead rather than raising into the read path.
    for k, (s, _) in list(_TABLE_MEMO.items()):
        try:
            dead = s._jsc.sc().isStopped()
        except Exception:  # noqa: BLE001
            dead = True
        if dead:
            _TABLE_MEMO.pop(k, None)
    # must be set in case the caller's session (e.g. the driver's)
    # didn't come from our factory; it is a runtime SQL conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer div: ns epochs (~1.7e18) exceed double's exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_MEMO[memo_key] = (spark, df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = DRIVER_TABLES
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def parquet_num_rows(path: str) -> int | None:
    """Exact row count from the parquet FOOTER(s) — a driver-side
    metadata read, no Spark job (the count every engine's
    count(*)-over-parquet shortcut uses). Handles both a single file
    and a Spark-written directory of part files (footers summed).
    None when a footer is unreadable — callers fall back to whatever
    job they were avoiding."""
    try:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as pq

        if _os.path.isdir(path):
            parts = _glob.glob(_os.path.join(path, "*.parquet"))
            if not parts:
                return None
            return sum(
                int(pq.ParquetFile(p).metadata.num_rows) for p in parts
            )
        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:  # noqa: BLE001 — unreadable/absent file
        return None


def parquet_numeric_bounds(
    path: str, columns: list[str]
) -> dict[str, tuple[float, float]] | None:
    """Exact global (min, max) per numeric column from parquet FOOTER
    statistics — a driver-side metadata read, no Spark job. This is
    the same per-row-group min/max every engine's predicate pushdown
    trusts; aggregating it across row groups gives the exact column
    bounds (numeric stats are never truncated, unlike strings).

    Returns None unless EVERY requested column has trustworthy
    min/max in EVERY row group (missing stats, all-NULL columns,
    non-numeric types, zero row groups) — callers fall back to a probe
    job. At 100 TB this replaces a full-scan aggregate with footer
    reads the planner already does."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:  # noqa: BLE001 — unreadable/absent file: probe instead
        return None
    if md.num_row_groups == 0:
        return None
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, tuple[float, float]] = {}
    for c in columns:
        i = names.get(c)
        if i is None:
            return None
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                return None
            try:
                mn, mx = float(st.min), float(st.max)
            except (TypeError, ValueError):
                return None  # non-numeric column
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        out[c] = (lo, hi)
    return out


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Rebalance a scan whose split count is far below the cluster's
    parallelism, so downstream compute-heavy stages (shingle explode +
    per-shingle hashing, token explode, vector math) use every core.

    Needed because parquet is only splittable at row-group granularity:
    a file written as one giant row group yields ONE scan task no
    matter how many executors exist, and everything pipelined onto the
    scan (project, explode, hash, partial agg) runs single-threaded.

    With ``keys``, partitions BY those columns instead of round-robin.
    Use this when the next operator is a groupBy on ``keys`` whose
    group cardinality is near the row count (no map-side reduction
    possible): the aggregate then runs in place on the repartitioned
    data and Catalyst elides its own exchange — one full-data shuffle
    total instead of partial-agg + exchange + final (which shuffles
    the same volume and pays a pointless pre-shuffle hash map).

    Adaptive, not unconditional: on a real cluster reading 100 TB the
    scan already has thousands of splits and this is an exact no-op —
    we never pay a full-data shuffle at scale. Locally (driver files =
    one row group) it costs one small shuffle and buys ~Ncores x on
    the pipelined compute.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = DRIVER_TABLES
) -> None:
    """Register each table as a temp view so operators can be written
    in Spark SQL when that is clearer than the DataFrame API."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """S1 generalized beyond parquet: csv / json / orc / text sources
    (the reference's MariaDB tables are opaque storage — any columnar
    or row format the lake holds maps to the same DataFrame surface).

    CSV/JSON default to an explicit ``schema`` when given — at 100 TB
    schema inference is a full extra pass over the data; never rely on
    it in production paths.
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_raw_files(
    spark: SparkSession,
    path: str,
    mode: str = "binary",
    glob: str | None = None,
    recursive: bool = True,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-FILE corpus ingest — the missing first mile between a
    bucket of scraped/exported files and the engine's `documents`
    shape (every tabular source goes through read_source; this is
    for the files that aren't a table yet):

    - ``mode="binary"``: Spark's binaryFile source, one row per file
      with (path, modificationTime, length, content BINARY) — the
      multimodal ingest shape (multimodal.py's decoders consume the
      opaque content column behind their fences). The source pushes
      filters on path/modificationTime/length down to the FILE
      LISTING, so ``max_bytes`` (compiled to a length predicate)
      skips oversized blobs without ever reading their bytes —
      plan-asserted in tests.
    - ``mode="text"``: one row per file with the WHOLE file as a
      string (path, text) — document-per-file corpora. Not
      splittable (a file is one task): right for many small docs,
      wrong for a few huge ones — use "lines" there.
    - ``mode="lines"``: spark.read.text + input_file_name(), one row
      per line (path, text) — splittable, the scale path for large
      line-oriented files.

    ``glob`` maps to pathGlobFilter (listing-time pruning, e.g.
    '*.txt'); ``recursive`` to recursiveFileLookup. Use
    attach-style helpers downstream to derive stable ids (e.g.
    xxhash64(path)) — paths, not positions, are the stable identity
    of file-born rows."""
    if mode not in ("binary", "text", "lines"):
        raise ValueError(f"unknown mode: {mode!r}")
    if mode == "binary":
        reader = spark.read.format("binaryFile")
    elif mode == "text":
        reader = spark.read.format("text").option("wholetext", "true")
    else:
        reader = spark.read.format("text")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if mode == "binary":
        if max_bytes is not None:
            df = df.where(F.col("length") <= int(max_bytes))
        return df
    out = df.select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    return out


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """S2/S3 generalized sink: parquet (default) / csv / json / orc."""
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_layer(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S2/S3 sink: materialize a pipeline layer (the reference's CTAS /
    INSERT...SELECT barrier, Stage_area.sql:25-30 etc.).

    ``partition_by`` is the Spark replacement for the reference's six
    B-tree indexes (DWH.sql:193-198): partition pruning + parquet
    min/max stats serve point/range lookups at scale.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    shard_key: str,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Training-shard sink: hash-partition rows into ``num_shards``
    deterministic shards on ``shard_key`` (same key -> same shard,
    so re-runs and incremental appends are stable), optionally
    bounding rows per file via spark.sql.files.maxRecordsPerFile so
    downstream loaders get uniformly-sized files. One shuffle, then
    embarrassingly-parallel writes — the standard corpus-shard layout
    for a 100 TB training run."""
    w = df.repartition(num_shards, shard_key).write.mode("overwrite").format(fmt)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def global_shuffle(
    df: DataFrame, id_col: str, seed: int = 0, partitions: int | None = None
) -> DataFrame:
    """Deterministic global shuffle for training-example order: sort
    by xxhash64(id, seed) via a RANGE repartition — different seeds
    give independent permutations, the same seed replays the same
    order (task retries and re-runs included, which rand() cannot
    promise). One range-exchange + per-partition sort; downstream
    writes preserve the order file-by-file, so a sequential reader of
    the shard listing sees the permutation. The epoch-reshuffle op of
    a training pipeline: pair with write_training_shards per epoch
    seed."""
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__shuffle_key", h)
        .repartitionByRange(n, "__shuffle_key")
        .sortWithinPartitions("__shuffle_key")
        .drop("__shuffle_key")
    )


#: hash space for the deterministic keep-rate thresholds below. 1e12
#: (not the former 1e6): a 100 TB mixture can legitimately water-fill
#: a huge source down to a rate below 1e-6, and int(rate * 1e6)
#: TRUNCATED such rates to threshold 0 — silently dropping the whole
#: source (round-12 review finding). At 1e12 the resolution is 1e-12
#: and rounding (not truncation) bounds the rate bias at 5e-13.
_MIX_HASH_SPACE = 1_000_000_000_000


def _mix_keep_threshold(rate: float) -> int:
    """Keep-threshold for a water-filled rate: round to the hash
    space, but never round a POSITIVE rate down to zero — a source
    the mixture allocated rows to must keep a nonzero slice (the
    1-in-1e12 over-sample this floor costs is noise; losing an
    entire source is not)."""
    if rate <= 0.0:
        return 0
    return max(1, round(rate * _MIX_HASH_SPACE))


def mix_sources(
    sources: list[tuple[DataFrame, float]], id_col: str, seed: int = 0
) -> DataFrame:
    """Training-mixture shaping across corpora: union ``sources`` with
    a per-source keep ``rate`` in [0, 1], sampled by deterministic
    hash threshold (replay-stable, engine-portable — the
    q_stratified_sample rule applied across FRAMES instead of within
    one). A `__source` index column tags provenance. Rates > 1 are
    rejected — upsampling is a reader-side repeat (epoch seeds via
    global_shuffle), not a row-duplication job."""
    out = None
    for i, (df, rate) in enumerate(sources):
        if not (0.0 <= rate <= 1.0):
            raise ValueError(
                f"source {i}: rate {rate} outside [0, 1] — upsample by"
                " repeating epochs (global_shuffle seeds), not by"
                " duplicating rows"
            )
        # pmod, not abs+%: abs(Long.MIN_VALUE) overflows and stays
        # negative, and % keeps the dividend's sign — either way a
        # negative threshold test that breaks the keep rule for ~1 in
        # 2^63 rows (and deterministically for whichever ids hash
        # there). pmod is non-negative by construction.
        h = F.pmod(
            F.xxhash64(F.col(id_col), F.lit(seed), F.lit(i)),
            F.lit(_MIX_HASH_SPACE),
        )
        kept = df.filter(h < _mix_keep_threshold(rate)).withColumn(
            "__source", F.lit(i)
        )
        out = kept if out is None else out.unionByName(kept)
    if out is None:
        raise ValueError("mix_sources needs at least one source")
    return out


def show_tables(spark: SparkSession) -> DataFrame:
    """S7 catalog listing (DWH.sql:215 `SHOW TABLES`)."""
    return spark.sql("SHOW TABLES")


def reset_database(spark: SparkSession, name: str) -> None:
    """S5 DDL lifecycle (Stage_area.sql:4-19 / DWH.sql:4-16):
    `DROP DATABASE IF EXISTS ... ; CREATE DATABASE ... ; USE ...` —
    the reference resets each layer's schema before rebuilding it."""
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    spark.sql(f"CREATE DATABASE {name}")
    spark.sql(f"USE {name}")


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """M8 replacement for the reference's six fact B-tree indexes
    (DWH.sql:193-198), Spark-style: bucketed (and optionally
    sorted) table layout. Two tables bucketed on the same join key
    with the same bucket count join WITHOUT any exchange — the
    shuffle is paid once at write time, then every downstream join /
    aggregation on that key is co-located (the 100 TB answer to 'we
    join fact to admissions constantly')."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(name)


def snapshot_persistent_rdds(spark: SparkSession) -> set:
    """Ids of every currently-persisted RDD (caches AND
    localCheckpoint blocks). Pair with release_new_persistent_rdds to
    scope cleanup to work created after the snapshot."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def release_new_persistent_rdds(spark: SparkSession, baseline: set) -> int:
    """Unpersist every persistent RDD not in ``baseline``; returns the
    count released. This is the only way to free localCheckpoint
    storage promptly: checkpointed RDDs are not CacheManager-
    registered, so catalog.clearCache()/Dataset.unpersist never touch
    them and the blocks otherwise live until ContextCleaner GC (the
    round-6 percentiles.release() finding, generalized). A pipeline
    that checkpoints per epoch/run calls this between runs — measured
    here: without it, four star-pipeline runs in one session degrade
    14->22 s as executor storage fills; with it they hold steady."""
    jm = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for rid in list(jm.keySet().toArray()):
        if rid not in baseline:
            jm.get(rid).unpersist(False)
            released += 1
    return released


class MaintenanceInProgressError(RuntimeError):
    """A compaction/maintenance rewrite currently holds ``path``'s
    maintenance lock: reads and appends must wait for the
    single-writer window to close (round-8 verdict item: the caveat
    is now an enforced contract, not a docstring)."""


def _maintenance_lock_path(path: str) -> str:
    return f"{path.rstrip('/')}.maintenance-lock"


def clear_stale_maintenance_lock(path: str) -> None:
    """Self-heal after a compactor crash: the lock file records the
    holder's pid; if that process is gone, the lock is stale and the
    next recover_compacted_dir pass (which handles every crash point
    of the swap itself) makes the directory safe again. Same-machine
    semantics — on a shared filesystem with multiple hosts a lease
    TTL would replace the pid probe."""
    lp = _maintenance_lock_path(path)
    try:
        with open(lp) as f:
            pid = int(f.read().strip() or "0")
    except FileNotFoundError:
        return
    except ValueError:
        pid = 0  # crashed between create and pid write: stale
    if pid:
        try:
            os.kill(pid, 0)
            return  # holder alive: lock stands
        except ProcessLookupError:
            pass
        except PermissionError:
            return  # alive under another uid
    try:
        os.remove(lp)
    except FileNotFoundError:
        pass


@contextlib.contextmanager
def maintenance_lock(path: str):
    """Single-writer guard for every maintenance rewrite of an
    append sink (compact_parquet_dir and the bespoke compactors that
    share its rename protocol). O_EXCL-creates ``path``'s lock file
    with the holder's pid; a second concurrent maintenance attempt
    raises MaintenanceInProgressError instead of interleaving two
    rename swaps (which can drop the only live copy). Released on
    exit, success or raise; a crashed holder's lock self-heals via
    clear_stale_maintenance_lock."""
    clear_stale_maintenance_lock(path)
    lp = _maintenance_lock_path(path)
    try:
        fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise MaintenanceInProgressError(
            f"maintenance already in progress on {path} (lock: {lp})"
        ) from None
    try:
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
        yield
    finally:
        try:
            os.remove(lp)
        except FileNotFoundError:
            pass


def publish_index_dir(build_dir: str, path: str, meta_name: str,
                      attempts: int = 5) -> None:
    """Publish a freshly built index directory at ``path`` via atomic
    rename, surviving BOTH failure modes of a contended publish:

    - **lost race**: a concurrent builder renamed a complete index
      (its ``meta_name`` marker exists) into ``path`` first — our
      build is discarded, the winner serves.
    - **corrupt leftover**: ``path`` exists but lacks ``meta_name``
      (crash mid-publish / external deletion) — the broken directory
      is cleared and the rename retried.

    The retry itself runs INSIDE the loop: if a concurrent builder
    publishes between our rmtree(path) and our rename, that rename's
    OSError re-enters the meta re-check instead of propagating (the
    unguarded-retry hole this helper exists to close). ``attempts``
    bounds pathological churn; on exhaustion the build is discarded
    and the last OSError raised rather than ever serving a meta-less
    directory."""
    import shutil

    last_err: OSError | None = None
    for _ in range(attempts):
        try:
            os.rename(build_dir, path)
            return
        except OSError as e:
            last_err = e
            if os.path.exists(os.path.join(path, meta_name)):
                # a complete index won the race: ours is redundant
                shutil.rmtree(build_dir, ignore_errors=True)
                return
            # meta-less target: corrupt leftover — clear and retry
            shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(build_dir, ignore_errors=True)
    assert last_err is not None
    raise last_err


def recover_compacted_dir(path: str) -> None:
    """Crash recovery for compact_parquet_dir's rename protocol, run
    before every read of an append sink that gets compacted. Cases,
    by where a crash hit (write tmp -> rename path to old -> rename
    tmp to path -> rm old):

    - during the tmp write: ``path`` intact; the incomplete tmp is
      swept.
    - between the two renames: ``path`` missing; the retired
      ``.old-compact`` is complete (it WAS the live directory) —
      restore it. The completed tmp is swept with it; the next
      compaction simply redoes the (idempotent) rewrite.
    - after the second rename: ``path`` is the compacted directory;
      stale siblings are swept.

    Raises MaintenanceInProgressError while a LIVE maintenance holder
    owns ``path``'s lock — this is what turns the "run between
    micro-batches" caveat into an enforced contract: every appender
    and reader in the repo recovers-before-touching, so an append
    issued inside an active compaction window fails fast instead of
    racing the rename swap. A crashed holder's lock self-heals
    (pid probe) before the check."""
    import shutil

    clear_stale_maintenance_lock(path)
    if os.path.exists(_maintenance_lock_path(path)):
        raise MaintenanceInProgressError(
            f"maintenance in progress on {path}; appends/reads must wait"
        )
    tmp = f"{path}.tmp-compact"
    old = f"{path}.old-compact"
    if not os.path.isdir(path):
        # the old sibling is created ONLY by an atomic rename of the
        # live directory, so its existence alone proves completeness
        # (no _SUCCESS requirement: dynamic-partition-overwrite sinks
        # like the pre-agg synopsis write no top-level marker)
        if os.path.isdir(old):
            os.rename(old, path)
        elif os.path.isdir(tmp) and os.path.exists(
            os.path.join(tmp, "_SUCCESS")
        ):
            # old already swept means the swap completed and something
            # external removed path; the committed tmp is the only
            # surviving complete copy — promote it rather than lose it
            os.rename(tmp, path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def compact_parquet_dir(
    spark: SparkSession, path: str, target_files: int, transform=None
) -> dict:
    """Small-file compaction for append-style parquet sinks (the
    operational complement of streaming_dedup_ingest / any
    foreachBatch append, which write >=1 file per micro-batch): read
    the directory, localCheckpoint it (the rewrite must never stream
    from the files it is about to replace), coalesce to
    ``target_files``, and publish with the same write-to-tmp +
    rename swap as streaming.publish_scd2_dim — at no point is the
    only copy deleted before its replacement committed; a crash
    leaves either the old or the new directory, both complete, and
    recover_compacted_dir (invoked here first, like
    streaming.read_scd2_dim's recover-before-read) restores ``path``
    from a _SUCCESS-complete sibling before anything reads it.
    coalesce, not repartition: compaction must not pay a shuffle —
    it only narrows the file count.

    ``transform`` (optional, DataFrame -> DataFrame) is applied
    before the checkpoint — the hook maintenance rewrites use to fold
    semantic cleanup into the same crash-safe publish (e.g.
    streaming.compact_pairs_distinct passes ``.distinct()`` so a
    replay-duplicated pairs sink is bounded by its true pair set).
    A transform MAY shuffle (distinct does); plain compaction never
    does.

    Returns {"files_before": n, "files_after": m, "rows": r} with
    ``rows`` counted AFTER the transform."""
    import glob
    import shutil

    recover_compacted_dir(path)
    with maintenance_lock(path):
        files_before = len(glob.glob(os.path.join(path, "*.parquet")))
        df = spark.read.parquet(path)
        if transform is not None:
            df = transform(df)
        df = df.localCheckpoint()
        rows = df.count()
        tmp = f"{path}.tmp-compact"
        old = f"{path}.old-compact"
        df.coalesce(max(int(target_files), 1)).write.mode("overwrite").parquet(tmp)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def write_sized(
    df,
    path: str,
    target_mb: int = 256,
    sample_rows: int = 10_000,
    partition_by: list[str] | None = None,
) -> dict:
    """Write parquet with files sized toward ``target_mb`` — the
    third file-size lever next to compact_parquet_dir (after the
    fact) and coalesce (fixed count): measure the ACTUAL on-disk
    bytes/row by writing a bounded sample to a dot-prefixed scratch
    dir (in-memory plan statistics over-estimate parquet by the
    whole compression factor, so they cannot target disk size), then
    let the writer split files by ``maxRecordsPerFile`` (every task
    splits its own output at the right row count, no shuffle).
    maxRecordsPerFile can only SPLIT — when the input has more
    partitions than the target file count, a shuffle-free coalesce
    merges down first (row count via one count job, the price of
    merging; skipped under partitionBy, where per-partition-value
    file counts are data-dependent).

    The sample's compression ratio stands in for the full data's
    (documented approximation — a skewed tail column can still
    deviate); the scratch dir is removed in all paths. Returns
    {"bytes_per_row", "records_per_file", "n_files"}."""
    import glob
    import math
    import shutil

    scratch = os.path.join(os.path.dirname(path) or ".", ".write-sized-sample")
    shutil.rmtree(scratch, ignore_errors=True)
    try:
        sample = df.limit(int(sample_rows))
        sample.write.mode("overwrite").parquet(scratch)
        files = glob.glob(os.path.join(scratch, "*.parquet"))
        nbytes = sum(os.path.getsize(f) for f in files)
        nrows = sample.sparkSession.read.parquet(scratch).count()
        if nrows == 0:
            raise ValueError("write_sized: empty input")
        bpr = max(nbytes / nrows, 1e-6)
        rpf = max(1, int(math.floor(target_mb * 1024 * 1024 / bpr)))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    out = df
    if not partition_by:
        total = df.count()
        want_files = max(1, math.ceil(total / rpf))
        if want_files < out.rdd.getNumPartitions():
            out = out.coalesce(want_files)
    writer = out.write.mode("overwrite").option("maxRecordsPerFile", rpf)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    n_files = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return {"bytes_per_row": bpr, "records_per_file": rpf, "n_files": n_files}


def read_evolved(spark, path: str, format: str = "parquet"):
    """Read an append sink whose batches were written under EVOLVING
    schemas (a column added mid-stream — the normal life of a
    long-lived ingest directory): parquet/orc footer schemas are
    merged across files (``mergeSchema``), so early files surface
    the late-added columns as NULL instead of the default
    first-file-wins read silently DROPPING them. Use for schema-
    drifting sinks only — schema merging reads every file footer, a
    real cost on millions of files, which is why Spark defaults it
    off and why the fixed-schema readers here (read_table) never pay
    it."""
    return spark.read.option("mergeSchema", "true").format(format).load(path)


def raw_to_documents(
    raw: DataFrame, path_col: str = "path", text_col: str = "text"
) -> DataFrame:
    """Adapt read_raw_files/read_text_file_stream output to the
    engine's `documents` shape: doc_id = xxhash64(path) (stable,
    layout-independent — file identity, not row position), source =
    the parent directory name (the per-source knob quota_sample /
    remove_boilerplate key on), n_chars. Pure projection; every text
    operator downstream (dedup, quality, BM25, ...) runs unchanged."""
    return raw.select(
        F.xxhash64(F.col(path_col)).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.element_at(F.split(F.col(path_col), "/"), -2).alias("source"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.col(path_col).alias("path"),
    )


class HistoryCompactedError(RuntimeError):
    """Raised by read_as_of when the requested historical point
    predates a compaction — the batch partitions it would need were
    folded into the base partition and no longer exist separately."""


def list_batches(spark: SparkSession, path: str) -> list[int]:
    """Batch ids present in a batch_id-partitioned exactly-once sink
    (negative = a compaction base partition). Listing-level only —
    reads directory names, no data files."""
    import glob as _glob

    recover_compacted_dir(path)
    out = []
    for p in _glob.glob(os.path.join(path, "batch_id=*")):
        with contextlib.suppress(ValueError):
            out.append(int(os.path.basename(p).split("=", 1)[1]))
    return sorted(out)


def read_as_of(spark: SparkSession, path: str, through_batch: int) -> DataFrame:
    """Historical (time-travel) read of a batch_id-partitioned
    exactly-once sink: the rows contributed by batches
    ``<= through_batch`` — the state a reader would have derived had
    it run just after that batch committed. Works on every sink in
    the family (preagg, expectations, heavy hitters, quantile
    synopsis, join views): their batch partitions are immutable
    once written, so history IS the partition set.

    Scale shape: batch_id is a PARTITION column, so the filter
    prunes at the listing level — an as-of read touches only the
    partitions it returns, never the full sink (plan-asserted in
    tests).

    Compaction contract: compaction deliberately folds history into
    one base partition to bound the read side — after it, points at
    or before the fold are unanswerable. If a base partition
    (negative batch_id) exists, this raises HistoryCompactedError
    naming the trade instead of silently returning a mixture of
    "all history" (the base) and "some history" (the filter) that
    equals neither. Readers that want current state compose base +
    live partitions via the family's own read_* functions."""
    batches = list_batches(spark, path)
    if any(b < 0 for b in batches):
        raise HistoryCompactedError(
            f"{path} has a compacted base partition; batches folded into it "
            "cannot be separated, so as-of reads are only valid on the "
            "uncompacted window. Read current state via the sink family's "
            "read_* function instead."
        )
    return spark.read.parquet(path).filter(
        F.col("batch_id") <= int(through_batch)
    )


def temperature_mix_rates(
    sizes: list[float], alpha: float, budget: float
) -> list[float]:
    """Per-source keep-rates for a temperature-weighted training
    mixture: target share p_i ∝ n_i^alpha (the multilingual-LM
    exponent-smoothing practice — alpha < 1 upweights rare sources,
    alpha=1 is proportional, alpha=0 uniform), scaled to a total
    ``budget`` of rows and water-filled: a source whose target
    exceeds its size caps at rate 1 and its unmet share is
    redistributed over the uncapped sources' temperature weights
    until the budget is exactly allocated (or everything caps).

    Driver-side pure arithmetic over O(sources) scalars — sizes come
    from the caller (one count per source, or the catalog). Feed the
    result straight into mix_sources."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if budget <= 0:
        raise ValueError("budget must be positive")
    if any(s < 0 for s in sizes) or not sizes:
        raise ValueError("sizes must be non-negative and non-empty")
    rates = [0.0] * len(sizes)
    live = [i for i, s in enumerate(sizes) if s > 0]
    remaining = float(budget)
    while live and remaining > 1e-12:
        weights = {i: sizes[i] ** alpha for i in live}
        total_w = sum(weights.values())
        targets = {i: remaining * weights[i] / total_w for i in live}
        capped = [i for i in live if targets[i] >= sizes[i] * (1 - rates[i])]
        if not capped:
            for i in live:
                rates[i] += targets[i] / sizes[i]
            return rates
        for i in capped:
            remaining -= sizes[i] * (1 - rates[i])
            rates[i] = 1.0
        live = [i for i in live if i not in capped]
    return rates


def temperature_mix(
    sources: list[DataFrame],
    id_col: str,
    alpha: float,
    budget: float,
    seed: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-weighted mixture of corpora: sizes each source
    (O(sources) scalar aggregations — metadata-cheap next to the
    training read itself), derives water-filled keep-rates via
    temperature_mix_rates, and samples with mix_sources'
    deterministic hash threshold (replay-stable, engine-portable).

    ``weight_col``: measure sources and the budget in the SUM of a
    column (e.g. a token count) instead of rows — the unit LLM
    mixture specs are actually written in. Sampling stays row-level
    by document hash, so the kept TOKEN mass matches the budget in
    expectation (exactly proportional when doc lengths are
    independent of the hash, which a content-independent id hash
    guarantees); the alternative — packing documents to an exact
    token budget — is a sequential knapsack, not a per-row filter,
    and belongs to pack_sequences downstream."""
    if weight_col is None:
        sizes = [float(df.count()) for df in sources]
    else:
        sizes = [
            float(
                df.agg(
                    F.coalesce(F.sum(weight_col), F.lit(0)).alias("s")
                ).first()["s"]
            )
            for df in sources
        ]
    rates = temperature_mix_rates(sizes, alpha, budget)
    return mix_sources(list(zip(sources, rates)), id_col, seed=seed)


def temperature_mix_keyed(
    df: DataFrame,
    key_col: str,
    id_col: str,
    alpha: float,
    budget: float,
    seed: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """``temperature_mix`` for the one-table-many-sources layout (a
    ``source`` column instead of N separate frames): sizes every
    source in ONE scan (a slim groupBy on the key), derives the same
    water-filled keep-rates via temperature_mix_rates, and samples
    with the same deterministic hash threshold — the per-key rates
    ride a broadcast literal map, so the whole mixture costs one
    aggregation plus one per-row filter. The list form would pay
    len(sources) full scans when the sources live in one table
    (each filter re-reads every row group unless the table is
    partitioned by source) — the difference between O(1) and O(20)
    passes over a 100 TB corpus.

    The per-row hash salts with the KEY VALUE rather than a list
    index, so a source's sample is stable under source addition/
    removal (index-salted hashes reshuffle every later source).
    NULL keys form their own source via the chr(0) sentinel (the
    q_dp_release convention). Rates are assigned over the sorted
    key order, so the result is deterministic for a given input.
    The size collect() is bounded by source cardinality — a dozen
    scalars per corpus, not data."""
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    measure = (
        F.count(F.lit(1)).cast("double")
        if weight_col is None
        else F.coalesce(F.sum(weight_col), F.lit(0)).cast("double")
    )
    sizes = {
        r["k"]: float(r["s"])
        for r in df.groupBy(k.alias("k")).agg(measure.alias("s")).collect()
    }
    if not sizes:
        raise ValueError("temperature_mix_keyed: empty input")
    keys = sorted(sizes)
    rates = temperature_mix_rates([sizes[key] for key in keys], alpha, budget)
    rate_map = F.create_map(
        *[
            lit
            for key, rate in zip(keys, rates)
            for lit in (F.lit(key), F.lit(_mix_keep_threshold(rate)))
        ]
    )
    # same pmod-not-abs discipline as mix_sources (abs(MIN_VALUE)
    # overflow; % keeps the dividend's sign)
    h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed), k), F.lit(_MIX_HASH_SPACE))
    return df.filter(h < rate_map[k])


def dataset_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard manifest of a training-shard directory: one row per
    parquet file with its row count and an ORDER-INDEPENDENT content
    fingerprint — sum over rows of xxhash64(all columns), carried in
    decimal(38,0) so the aggregation is exact (a bigint sum would
    wrap or, under ANSI, error) and reduced mod 2^63 at the end.

    Scale shape: ONE distributed aggregation grouped by
    input_file_name(); the fingerprint is distributive (map-side
    partials), rows never reach the driver, no per-file driver-side
    reads. Order independence is the point: a shard re-written by a
    different partitioning of the same rows fingerprints identically
    at the dataset level (sum is commutative), so the manifest
    detects CONTENT changes, not layout changes."""
    df = spark.read.parquet(path)
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.pmod(
                F.sum(h),
                # 2^63 as a decimal literal: the plain int overflows
                # py4j's long conversion
                F.lit("9223372036854775808").cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("fingerprint"),
        )
        .select(
            F.regexp_extract("__file", r"([^/]+)$", 1).alias("shard"),
            "rows",
            "fingerprint",
        )
    )


def write_dataset_manifest(
    spark: SparkSession,
    path: str,
    extra: dict | None = None,
) -> dict:
    """Dataset-release packaging: computes dataset_manifest over the
    shard directory and writes ``_MANIFEST.json`` inside it (the
    underscore prefix keeps it invisible to Spark's file index —
    a plain name would be picked up as a parquet part and break
    every later read of the directory) — shard
    list (name, rows, fingerprint), dataset totals (row count and
    the order/layout-independent dataset fingerprint = sum of shard
    fingerprints mod 2^63), the schema, and any caller ``extra``
    (mixture weights, dedup stats, source card) — the file a
    consumer checks before training and an auditor diffs between
    releases. Returns the manifest dict.

    The manifest is written atomically (tmp + rename) so a crashed
    writer never leaves a half manifest next to good shards."""
    import json

    shards = sorted(
        (r["shard"], r["rows"], r["fingerprint"])
        for r in dataset_manifest(spark, path).collect()
    )
    total_rows = sum(r for _, r, _ in shards)
    dataset_fp = sum(f for _, _, f in shards) % (2**63)
    manifest = {
        "shards": [
            {"shard": s, "rows": r, "fingerprint": f} for s, r, f in shards
        ],
        "total_rows": total_rows,
        "dataset_fingerprint": dataset_fp,
        "schema": spark.read.parquet(path).schema.jsonValue(),
        "extra": extra or {},
    }
    tmp = os.path.join(path, "._MANIFEST.json.tmp")
    final = os.path.join(path, "_MANIFEST.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, final)
    return manifest


def verify_dataset_manifest(spark: SparkSession, path: str) -> dict:
    """Re-derive the manifest and compare against _MANIFEST.json:
    returns {"ok": bool, "mismatches": [...]} naming every shard
    whose rows or fingerprint moved, plus shards added/removed —
    the consumer-side integrity gate before a training run."""
    import json

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        recorded = json.load(fh)
    current = {
        r["shard"]: (r["rows"], r["fingerprint"])
        for r in dataset_manifest(spark, path).collect()
    }
    mismatches = []
    seen = set()
    for s in recorded["shards"]:
        seen.add(s["shard"])
        cur = current.get(s["shard"])
        if cur is None:
            mismatches.append({"shard": s["shard"], "problem": "missing"})
        elif cur != (s["rows"], s["fingerprint"]):
            mismatches.append({"shard": s["shard"], "problem": "changed"})
    for name in sorted(set(current) - seen):
        mismatches.append({"shard": name, "problem": "added"})
    return {"ok": not mismatches, "mismatches": mismatches}
