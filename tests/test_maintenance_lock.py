"""Single-writer maintenance lock (round-8 verdict item 8): the
"run compactions between micro-batches" caveat is now an enforced
contract — an append or read issued while a LIVE maintenance holder
owns a sink's lock fails fast with MaintenanceInProgressError instead
of racing the rename swap, and a crashed holder's lock self-heals."""

from __future__ import annotations

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import streaming
from clinical_data_warehouse_bi_spark.io import (
    MaintenanceInProgressError,
    compact_parquet_dir,
    maintenance_lock,
    recover_compacted_dir,
)


def _events(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("admission_id"),
        (F.col("id") % 3).alias("clinical_concept_id"),
        F.lit("lab").alias("event_source_type"),
    )


def test_append_rejected_while_maintenance_live(spark, tmp_path):
    """The failure mode the round-8 docstrings only warned about:
    an append landing inside an active compaction window. With the
    lock held by a live process (this one), the appender's
    recover-before-touch raises instead of interleaving."""
    syn = str(tmp_path / "synopsis")
    streaming.preagg_apply_batch(_events(spark), syn, batch_id=0)
    with maintenance_lock(syn):
        with pytest.raises(MaintenanceInProgressError):
            streaming.preagg_apply_batch(_events(spark), syn, batch_id=1)
        with pytest.raises(MaintenanceInProgressError):
            recover_compacted_dir(syn)
    # window closed: the same append now succeeds
    streaming.preagg_apply_batch(_events(spark), syn, batch_id=1)
    assert streaming.read_preagg(spark, syn).count() > 0


def test_second_maintenance_attempt_rejected(spark, tmp_path):
    p = str(tmp_path / "sink")
    spark.range(10).write.parquet(p)
    with maintenance_lock(p):
        with pytest.raises(MaintenanceInProgressError):
            with maintenance_lock(p):
                pass


def test_stale_lock_self_heals(spark, tmp_path):
    """A compactor that died mid-window must not brick the sink: the
    lock records the holder pid; a genuinely dead holder's lock is
    cleared on the next recover pass."""
    p = str(tmp_path / "sink")
    spark.range(10).write.parquet(p)
    proc = subprocess.run(["sh", "-c", "echo $$"], capture_output=True, text=True)
    dead_pid = int(proc.stdout.strip())  # this shell has exited
    with open(f"{p}.maintenance-lock", "w") as f:
        f.write(str(dead_pid))
    recover_compacted_dir(p)  # no raise: stale lock swept
    assert not os.path.exists(f"{p}.maintenance-lock")


def test_compaction_takes_and_releases_lock(spark, tmp_path):
    p = str(tmp_path / "sink")
    spark.range(10).coalesce(1).write.parquet(p)
    spark.range(10, 20).coalesce(1).write.mode("append").parquet(p)
    stats = compact_parquet_dir(spark, p, target_files=1)
    assert stats["rows"] == 20
    assert not os.path.exists(f"{p}.maintenance-lock")
    # the raise path releases too (unreadable dir -> read fails)
    bad = str(tmp_path / "missing")
    with pytest.raises(Exception):
        compact_parquet_dir(spark, bad, target_files=1)
    assert not os.path.exists(f"{bad}.maintenance-lock")
