"""Mirror of the driver's t2 gate: every registered query vs its
DuckDB oracle — row count, sorted column names, order-insensitive
stringified row multiset. Runs at sf0.001 for speed (set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the gate scale, or
use scripts/check_parity.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from clinical_data_warehouse_bi_spark.registry import all_oracles, all_queries


def _normalize(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    cells = []
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            s = s.map(lambda v: None if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_bool_dtype(s):
            s = s.map(lambda v: None if pd.isna(v) else str(bool(v)))
        else:
            s = s.map(
                lambda v: None
                if v is None or (isinstance(v, float) and pd.isna(v))
                else str(v)
            )
        # NaT -> NaN after strftime, etc.: anything non-str is a null
        cells.append([c if isinstance(c, str) else None for c in s.tolist()])
    rows = (
        sorted(tuple("<NULL>" if c is None else c for c in row) for row in zip(*cells))
        if cells
        else []
    )
    return list(df.columns), rows


def _names():
    return sorted(all_queries())


@pytest.mark.slow
@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn = all_queries()[name]
    oracles = all_oracles()
    spark_df = fn(spark, sf_dir).toPandas()
    if name not in oracles:
        assert len(spark_df) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_df = duck.execute(oracles[name]).df()
    s_cols, s_rows = _normalize(spark_df)
    d_cols, d_rows = _normalize(duck_df)
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ][:3]
    assert not mismatches, f"first mismatches: {mismatches}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
