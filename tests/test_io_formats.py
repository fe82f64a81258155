"""Source/sink format coverage (SURVEY.md section 2.1 S1/S2
generalized): round-trip parquet / csv / json through read_source /
write_sink and through a partitioned layer write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_warehouse_bi_spark.io import read_source, read_table, write_sink


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_sink(src, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=src.schema)
    assert back.count() == src.count()
    assert {f.name for f in back.schema.fields} == {f.name for f in src.schema.fields}
    # value-level spot check, order-insensitive
    a = {tuple(r) for r in src.select("n_nationkey", "n_name").collect()}
    b = {tuple(r) for r in back.select("n_nationkey", "n_name").collect()}
    assert a == b


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    src = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_part")
    write_sink(src, path, partition_by=["n_regionkey"])
    back = read_source(spark, path)
    one = back.filter(F.col("n_regionkey") == 0)
    # partition pruning: the filtered scan must read only the matching
    # directory (PartitionFilters in the physical plan)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "n_regionkey" in plan
    assert one.count() == src.filter(F.col("n_regionkey") == 0).count()
