"""Compatibility shim: the fixture generator moved into the package
(clinical_data_warehouse_bi_spark.fixtures) so bench.py can drive the
full star pipeline on the same deterministic sources the e2e tests
use."""

from clinical_data_warehouse_bi_spark.fixtures import (  # noqa: F401
    CAREUNITS,
    ICD_TITLES,
    LAB_LABELS,
    make_sources,
)
