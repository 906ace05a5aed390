"""Query registry: one place where every operator's Spark implementation
meets its DuckDB oracle SQL (the driver's correctness gate,
__spark_entry__.py contract).

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus an optional
ANSI-SQL string DuckDB can run over the same parquet tables. Queries whose
semantics are not SQL-expressible (custom stateful streaming, LSH variants
kept as scale paths) register ``oracle=None`` and get the driver's weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Entry] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Entry(fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: entry.fn for name, entry in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: entry.oracle for name, entry in REGISTRY.items() if entry.oracle
    }
