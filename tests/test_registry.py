"""Locks the registry to the driver's correctness-gate contract:
round 2 proved the driver records at most the first 50 registry
entries, so (a) the registry must not outgrow 50 without a
deliberate retirement, and (b) any query NOT yet triaged into
_CHECK_ORDER must be emitted first so new work is always checked."""

from __future__ import annotations

from clinical_data_warehouse_bi_spark.registry import (
    _CHECK_ORDER,
    all_oracles,
    all_queries,
)

DRIVER_CORRECTNESS_CAP = 50

#: the entries the round-2 gate silently skipped (VERDICT r2 finding
#: #1) — still registered, they must lead so they can never fall off
#: again. Round 5 retired q_doc_fingerprint and q_dedup_exact from
#: the registry entirely (witness: q_corpus_clean), so only the five
#: surviving ones are pinned here.
ROUND2_SKIPPED = [
    # q_window_tumbling was the third member until its round-8
    # retirement (witness: the streaming batch-equivalence test;
    # full oracle in test_retired_parity.py); q_frame_sample followed
    # in round 9 (witness: q_multimodal_features + the sampling
    # family; full oracle in test_retired_parity.py); and
    # q_stream_dedup_dual in round 12 (witnesses: the streaming
    # two-drain suite + q_corpus_clean; full oracle in
    # test_retired_parity.py)
    "q_multimodal_features",
    "q_sessionize",
]


def test_registry_fits_driver_cap():
    assert len(all_queries()) <= DRIVER_CORRECTNESS_CAP


def test_check_order_has_no_dangling_names():
    registered = set(all_queries())
    dangling = [n for n in _CHECK_ORDER if n not in registered]
    assert not dangling, f"_CHECK_ORDER names unregistered queries: {dangling}"


def test_new_queries_would_lead():
    """Unlisted (future) queries are emitted before listed ones."""
    names = list(all_queries())
    listed_positions = [names.index(n) for n in _CHECK_ORDER if n in names]
    unlisted_positions = [
        i for i, n in enumerate(names) if n not in _CHECK_ORDER
    ]
    if unlisted_positions and listed_positions:
        assert max(unlisted_positions) < min(listed_positions)


def test_round2_skipped_entries_lead():
    names = list(all_queries())
    n_unlisted = sum(1 for n in names if n not in _CHECK_ORDER)
    head = names[n_unlisted : n_unlisted + len(ROUND2_SKIPPED)]
    assert head == ROUND2_SKIPPED


def test_oracles_subset_of_queries():
    assert set(all_oracles()) <= set(all_queries())
