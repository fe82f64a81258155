from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round-16 verdict item 2): the driver's verify
    budget cannot fit the full 600-test/~40-min suite, so tests
    marked ``slow`` (cross-engine parity sweeps, e2e pipeline runs,
    scale probes) are DESELECTED from the default `pytest tests/`
    tier and run in the full tier instead:

        SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/   # everything
        python -m pytest tests/ -m slow                    # slow only

    Deselected (not skipped) so the default tier's summary counts
    only what actually ran. An explicit ``-m`` expression naming
    ``slow`` takes over selection entirely (this hook stands down)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    if "slow" in (config.option.markexpr or ""):
        return
    kept, dropped = [], []
    for item in items:
        (dropped if item.get_closest_marker("slow") else kept).append(item)
    if dropped:
        config.hook.pytest_deselected(items=dropped)
        items[:] = kept


@pytest.fixture(scope="session")
def spark():
    from clinical_data_warehouse_bi_spark.session import get_spark

    # small shuffle-partition count: test data is tiny
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from clinical_data_warehouse_bi_spark.io import DRIVER_TABLES

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
