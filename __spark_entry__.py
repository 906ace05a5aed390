"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual engine lives in ``dump1090_stream_parser_spark``; this module
is a thin adapter over its operator registry (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's working directory.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dump1090_stream_parser_spark import operators as _ops  # noqa: E402
from dump1090_stream_parser_spark.operators.relational import q_group_topk


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.3):
    top-10 busiest entities -- scan -> partial+final hash agg -> top-k."""
    return q_group_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ops.queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. As of round 6
    every registered query has one (sketch/eigensolve operators export
    exact statistics plus bounded-error certificate booleans instead of
    engine-specific estimates, so the full value-hash check applies)."""
    return _ops.oracle_sql_map()
