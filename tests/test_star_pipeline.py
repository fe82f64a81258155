"""End-to-end clinical pipeline test (SURVEY.md section 5.3): run the
full staging -> DWH -> agg lifecycle on MIMIC-shaped fixtures, then
assert the ported QA suite comes back clean (modulo the reference's
own documented quirks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark import qa, star
from tests.clinical_fixtures import make_sources


@pytest.fixture(scope="module")
def pipeline(spark):
    src = make_sources(spark)
    out = star.run_pipeline(src)
    # cache the two facts: every QA probe re-reads them
    out["stage"]["fact_disorder_events"].cache()
    out["dwh"]["fact_disorder_events"].cache()
    return src, out["stage"], out["dwh"]


@pytest.mark.slow
def test_stage_fact_shape(pipeline):
    src, stage, dwh = pipeline
    fact = stage["fact_disorder_events"]
    assert fact.columns == star.FACT_COLS
    n = fact.count()
    assert n > 0
    # surrogate keys are dense and unique
    assert fact.select("disorder_event_id").distinct().count() == n
    srcs = {r["event_source_type"] for r in fact.select("event_source_type").distinct().collect()}
    assert srcs == {"lab", "diagnosis", "omr"}


def test_sentinel_timestamps_applied(pipeline):
    src, stage, dwh = pipeline
    adm = stage["dim_admissions"]
    lo = adm.filter(F.col("admittime") == F.lit("1900-01-01 00:00:00").cast("timestamp"))
    hi = adm.filter(F.col("dischtime") == F.lit("2999-12-31 23:59:59").cast("timestamp"))
    assert lo.count() > 0 and hi.count() > 0
    assert adm.filter(F.col("admittime").isNull()).count() == 0


def test_unknown_concept_backfill(pipeline):
    src, stage, dwh = pipeline
    fact = stage["fact_disorder_events"]
    assert fact.filter(F.col("clinical_concept_id").isNull()).count() == 0
    unknown_id = (
        stage["dim_concepts"]
        .filter(F.col("concept_name") == "Unknown concept")
        .first()["clinical_concept_id"]
    )
    # unmatched lab items (non-keyword labels) must map to Unknown
    assert fact.filter(F.col("clinical_concept_id") == unknown_id).count() > 0


def test_interval_join_careunit_backfill(pipeline):
    src, stage, dwh = pipeline
    fact = stage["fact_disorder_events"]
    # at least some lab events fall inside a transfer interval
    assert fact.filter(F.col("careunit_id").isNotNull()).count() > 0
    # determinism: the same pipeline run twice gives identical careunit
    fact2 = star.build_staging(src)["fact_disorder_events"]
    a = fact.select("disorder_event_id", "careunit_id", "provider_id")
    b = fact2.select("disorder_event_id", "careunit_id", "provider_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_junk_dim_linkage(pipeline):
    src, stage, dwh = pipeline
    fact = stage["fact_disorder_events"]
    junk = stage["dim_junk_disorder_event"]
    # every fact row links to exactly one junk row (null-safe join)
    assert fact.filter(F.col("junk_id").isNull()).count() == 0
    n_combos = (
        fact.select("event_source_type", "measurement_unit", "careunit_id")
        .distinct()
        .count()
    )
    assert junk.count() == n_combos


def test_qa_duplicates_zero(pipeline):
    src, stage, dwh = pipeline
    dup = qa.duplicate_checks(dwh).collect()
    assert all(r["num_dupes"] == 0 for r in dup), dup


def test_qa_orphans(pipeline):
    src, stage, dwh = pipeline
    rows = {r["issue"]: r["num_records"] for r in qa.orphan_checks(dwh).collect()}
    assert rows["Orphan patients"] == 0
    assert rows["Orphan concepts"] == 0
    assert rows["Orphan dates"] == 0
    assert rows["Orphan junk_id"] == 0
    # reference quirk (QA.sql:88-92): NULL admission_id (all OMR rows)
    # counts as an orphan under LEFT JOIN USING semantics
    null_adm = (
        dwh["fact_disorder_events"].filter(F.col("admission_id").isNull()).count()
    )
    assert rows["Orphan admissions"] == null_adm


def test_qa_fact_vs_agg_zero(pipeline):
    src, stage, dwh = pipeline
    row = qa.fact_vs_agg(dwh).collect()[0]
    assert row["diff_events"] == 0


def test_qa_rowcount_reconciliation(pipeline):
    src, stage, dwh = pipeline
    rows = {r["table_name"]: r for r in qa.rowcount_reconciliation(stage, dwh).collect()}
    # dims with unique natural keys promote 1:1
    assert rows["dim_patients"]["diff_rows"] == 0
    assert rows["dim_concepts"]["diff_rows"] == 0
    assert rows["dim_date"]["diff_rows"] == 0
    # fact may shrink via DISTINCT + orphan cleanup but never grow
    assert rows["fact_disorder_events"]["diff_rows"] >= 0
    for r in rows.values():
        assert r["dwh_rows"] > 0


def test_agg_matches_manual(pipeline):
    src, stage, dwh = pipeline
    agg = dwh["agg_disorders_per_admission"]
    manual = (
        dwh["fact_disorder_events"]
        .groupBy("admission_id")
        .agg(F.count("*").alias("n"))
    )
    joined = agg.join(manual, "admission_id")
    assert joined.filter(F.col("total_events") != F.col("n")).count() == 0


@pytest.mark.slow
def test_materialized_layers_partition_fact(spark, tmp_path_factory):
    """out_dir writes each layer to parquet; the DWH fact is
    partitioned by event_source_type (the reference's fact-index
    replacement) and reads back identically."""
    import os

    out_dir = str(tmp_path_factory.mktemp("dwh_layers"))
    src = make_sources(spark)
    out = star.run_pipeline(src, out_dir=out_dir)
    fact_dir = os.path.join(out_dir, "dwh", "fact_disorder_events")
    parts = [d for d in os.listdir(fact_dir) if d.startswith("event_source_type=")]
    assert len(parts) >= 2
    # partition pruning reaches the scan for a per-source slice
    sliced = out["dwh"]["fact_disorder_events"].filter(
        F.col("event_source_type") == "Lab"
    )
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "event_source_type" in plan
    # in-memory rebuild agrees with the materialized round-trip
    rebuilt = star.run_pipeline(make_sources(spark))
    assert (
        out["dwh"]["fact_disorder_events"].count()
        == rebuilt["dwh"]["fact_disorder_events"].count()
    )


@pytest.mark.slow
def test_release_frees_pipeline_checkpoints(spark):
    """A pipeline run pins localCheckpoint RDD blocks that
    catalog.clearCache cannot release (not CacheManager-registered);
    io.release_new_persistent_rdds must return the session exactly to
    its pre-run storage baseline — the between-epochs cleanup a
    long-lived session needs (without it, repeated runs degrade as
    executor storage fills)."""
    from clinical_data_warehouse_bi_spark.io import (
        release_new_persistent_rdds,
        snapshot_persistent_rdds,
    )

    spark.catalog.clearCache()
    src = make_sources(spark)
    baseline = snapshot_persistent_rdds(spark)
    out = star.run_pipeline(src)
    out["dwh"]["fact_disorder_events"].write.format("noop").mode(
        "overwrite"
    ).save()
    created = snapshot_persistent_rdds(spark) - baseline
    assert created, "expected the pipeline to checkpoint at its barriers"
    released = release_new_persistent_rdds(spark, baseline)
    # ContextCleaner may have GC-released some concurrently, so bound
    # rather than equate; the invariant is NO new RDD survives
    assert released <= len(created)
    assert snapshot_persistent_rdds(spark) - baseline == set()


@pytest.mark.slow
def test_zordered_fact_layout_prunes_point_probes(spark, tmp_path_factory):
    """M8 end-to-end: run_pipeline(zorder_fact=True) writes the DWH
    fact Z-ordered on (admission_id, event_datetime); a point/range
    probe box must skip MORE row groups than the same data in an
    arrival-order layout, with identical content."""
    import os

    from clinical_data_warehouse_bi_spark.layout import zorder_effectiveness

    out_dir = str(tmp_path_factory.mktemp("dwh_z"))
    src = make_sources(spark, n_patients=400)
    out = star.run_pipeline(
        src,
        out_dir=out_dir,
        zorder_fact=True,
        # small row groups force many footer entries from small data;
        # production uses the 128 MB default
        zorder_opts={"partitions": 8, "parquet_block_bytes": 16 * 1024},
    )
    fact = out["dwh"]["fact_disorder_events"]
    z_dir = os.path.join(out_dir, "dwh", "fact_disorder_events")
    assert any(f.endswith(".parquet") for f in os.listdir(z_dir))

    # arrival-order baseline of the SAME rows, same file/group
    # geometry. Deterministic layout: hash-repartition on the
    # surrogate key + sort within partitions by it, so every run
    # writes identical files (round-robin repartition() is
    # scheduling-dependent and made this test flaky). Keying on
    # disorder_event_id — NOT the z-order box columns — keeps the
    # baseline genuinely "arrival-order" w.r.t. the probe box.
    plain_dir = str(tmp_path_factory.mktemp("fact_plain"))
    (
        fact.repartition(8, F.col("disorder_event_id"))
        .sortWithinPartitions("disorder_event_id")
        .write.mode("overwrite")
        .option("parquet.block.size", str(16 * 1024))
        .parquet(plain_dir)
    )

    # box: one mid-range admission band x one narrow time window
    r = fact.agg(
        F.min("admission_id").alias("a0"),
        F.max("admission_id").alias("a1"),
        F.min("event_datetime").alias("t0"),
        F.max("event_datetime").alias("t1"),
    ).first()
    a_mid = (r.a0 + r.a1) // 2
    a_w = max((r.a1 - r.a0) // 20, 1)
    t_mid = r.t0 + (r.t1 - r.t0) / 2
    t_w = (r.t1 - r.t0) / 20
    box = {
        "admission_id": (a_mid, a_mid + a_w),
        "event_datetime": (t_mid, t_mid + t_w),
    }
    eff = zorder_effectiveness(plain_dir, z_dir, box)
    assert eff["zordered"]["total"] >= 4, eff  # geometry sanity
    assert eff["skip_improvement"] > 1.0, eff

    # content identical to the default-layout pipeline. The surrogate
    # key is excluded from the content hash: scale-mode keys are
    # arbitrary-but-dense BY CONTRACT (build_staging docstring — the
    # zip assignment follows physical order, which legitimately
    # differs between a parquet-round-tripped staging layer and an
    # in-memory lineage; round 13 verified every OTHER column
    # hash-equal across layouts and the key's own contract is
    # asserted below instead).
    rebuilt = star.run_pipeline(make_sources(spark, n_patients=400))
    other = rebuilt["dwh"]["fact_disorder_events"]
    cols = sorted(c for c in fact.columns if c != "disorder_event_id")
    h = lambda d: d.select(  # noqa: E731
        F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("rh")
    ).agg(
        F.expr("bit_xor(rh)").alias("h"), F.count("*").alias("n")
    ).first()
    hz, hp = h(fact), h(other)
    assert (hz.h, hz.n) == (hp.h, hp.n)
    # key contract in BOTH layouts: unique, assigned dense 1..M over
    # the pre-cleanup promote (M >= surviving N: orphan DELETEs leave
    # gaps, the reference's assign-then-delete structure)
    for d in (fact, other):
        r = d.agg(
            F.count("*").alias("n"),
            F.count_distinct("disorder_event_id").alias("nd"),
            F.min("disorder_event_id").alias("lo"),
            F.max("disorder_event_id").alias("hi"),
        ).first()
        assert r.nd == r.n and r.lo >= 1 and r.hi >= r.n


def test_deidentified_release_preserves_analytics(pipeline):
    """The clinical release composition: pseudonymize patient and
    admission ids, date-shift event times per patient — then verify
    (a) referential joins still line up on the pseudonyms, (b)
    within-patient event intervals are EXACTLY preserved (the
    analytic property de-identified research data must keep), and
    (c) no raw id survives into the released fact."""
    from clinical_data_warehouse_bi_spark import scrub

    _, _, dwh = pipeline
    fact = dwh["fact_disorder_events"]
    raw_pids = {r["patient_id"] for r in fact.select("patient_id").distinct().collect()}

    released = scrub.date_shift(
        fact, "patient_id", ["event_datetime"], "relkey", max_days=30
    )
    released = scrub.pseudonymize(released, ["patient_id", "admission_id"], "relkey")
    pat_dim = scrub.pseudonymize(
        dwh["dim_patients"], ["patient_id"], "relkey"
    )

    # (a) the released fact joins its released dim exactly as before
    assert (
        released.join(pat_dim, "patient_id").count()
        == fact.join(dwh["dim_patients"], "patient_id").count()
    )
    # (b) per-patient event intervals survive the shift exactly
    import datetime as dt

    raw_sp = (
        fact.groupBy("patient_id")
        .agg(
            (F.max("event_datetime") - F.min("event_datetime")).alias("span")
        )
        .collect()
    )
    rel_spans = sorted(
        r["span"] for r in released.groupBy("patient_id")
        .agg((F.max("event_datetime") - F.min("event_datetime")).alias("span"))
        .collect()
    )
    assert sorted(r["span"] for r in raw_sp) == rel_spans
    # (c) no raw numeric id appears in the released key columns
    rel_pids = {
        r["patient_id"] for r in released.select("patient_id").distinct().collect()
    }
    assert not ({str(p) for p in raw_pids} & rel_pids)


@pytest.mark.slow
def test_dwh_scale_path_matches_parity(spark):
    """The round-14 scale-path elisions (four provably-no-op orphan
    probes + the provably-empty dim_date top-up + post-cleanup dense
    keys) must be invisible in the DATA: every DWH relation equals
    the parity build row-for-row, with only the fact surrogate-key
    VALUES allowed to differ (dense-over-survivors vs
    gap-preserving, both unique)."""
    src = make_sources(spark, n_patients=200)
    stage = star.build_staging(src)
    for name, df in stage.items():
        stage[name] = df.localCheckpoint()  # one shared staging input
    scale = star.build_dwh(stage, parity_keys=False)
    parity = star.build_dwh(stage, parity_keys=True)

    def rows(df, drop=()):
        cols = sorted(c for c in df.columns if c not in drop)
        return sorted(
            tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
        )

    for name in (
        "dim_patients", "dim_admissions", "dim_provider", "dim_concepts",
        "dim_date", "dim_junk_disorder_event", "agg_disorders_per_admission",
    ):
        assert rows(scale[name]) == rows(parity[name]), name
    assert rows(
        scale["fact_disorder_events"], drop=("disorder_event_id",)
    ) == rows(parity["fact_disorder_events"], drop=("disorder_event_id",))
    # scale keys: dense 1..N over the SURVIVING rows
    r = scale["fact_disorder_events"].agg(
        F.count("*").alias("n"),
        F.count_distinct("disorder_event_id").alias("nd"),
        F.min("disorder_event_id").alias("lo"),
        F.max("disorder_event_id").alias("hi"),
    ).first()
    assert (r.nd, r.lo, r.hi) == (r.n, 1, r.n)


@pytest.mark.slow
def test_dwh_scale_path_provenance_tripwire(spark):
    """Round-14 verdict item 7: the scale path's probe elisions are
    gated on build_staging's provenance marker. A DOCTORED hand-built
    stage dict (a plain dict whose dim_concepts lost a key the fact
    references) at DEFAULT settings must get the full probe set —
    orphaned fact rows deleted, output row-set equal to the parity
    build on the same doctored input — instead of silently-elided
    probes leaking orphans; the tagged build_staging dict keeps the
    elision (pinned separately by
    test_dwh_scale_path_matches_parity)."""
    src = make_sources(spark, n_patients=120)
    stage = star.build_staging(src)
    assert getattr(stage, "_from_build_staging", False)
    # hand-built: a FRESH plain dict (marker dropped), with one
    # referenced concept removed from the dim — fact rows carrying it
    # are now orphans the elided probes would leak
    victim = (
        stage["fact_disorder_events"]
        .select("clinical_concept_id").filter("clinical_concept_id is not null")
        .first()["clinical_concept_id"]
    )
    doctored = {k: v for k, v in stage.items()}
    assert not getattr(doctored, "_from_build_staging", False)
    doctored["dim_concepts"] = stage["dim_concepts"].filter(
        F.col("clinical_concept_id") != victim
    )
    scale = star.build_dwh(doctored, parity_keys=False)
    parity = star.build_dwh(doctored, parity_keys=True)
    # the orphaned concept rows are gone at default settings
    assert (
        scale["fact_disorder_events"]
        .filter(F.col("clinical_concept_id") == victim)
        .count()
        == 0
    )

    def rows(df, drop=()):
        cols = sorted(c for c in df.columns if c not in drop)
        return sorted(
            tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
        )

    assert rows(
        scale["fact_disorder_events"], drop=("disorder_event_id",)
    ) == rows(parity["fact_disorder_events"], drop=("disorder_event_id",))
