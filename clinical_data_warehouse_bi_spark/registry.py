"""Query registry: the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) an ANSI-SQL oracle string DuckDB runs on
the same parquet tables. Column names/aliases MUST match between the
two: the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query under ``name`` with an optional
    DuckDB oracle. ``oracle=None`` => driver records a weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: q.fn for n, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def _load() -> None:
    """Import all query modules (side effect: they register)."""
    from clinical_data_warehouse_bi_spark import queries  # noqa: F401
