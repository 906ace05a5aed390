"""Regression tests for the dtype-strict local parity gate.

Round-1 lesson: DuckDB types a raw SUM of an integer expression as
HUGEINT, which pandas reads as float64 while Spark emits int64; the
driver's value-hash then fails even though values are equal. The local
``compare`` must catch that class BEFORE the driver does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.tables import load_table
from dump1090_stream_parser_spark.testing import compare

from .conftest import SF_DIR


def _sum_df(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.agg(F.sum("n_chars").cast("bigint").alias("total_chars"))


def test_raw_integer_sum_oracle_fails_dtype_strict(spark, oracle):
    # uncast SUM -> HUGEINT -> float64 in pandas: must be flagged
    problems = compare(
        _sum_df(spark), oracle, "SELECT SUM(n_chars) AS total_chars FROM documents"
    )
    assert problems, "HUGEINT leak must fail the local gate"
    assert any("dtype drift" in p for p in problems)


def test_cast_bigint_sum_oracle_passes(spark, oracle):
    problems = compare(
        _sum_df(spark),
        oracle,
        "SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents",
    )
    assert problems == []


def test_value_mismatch_still_detected(spark, oracle):
    problems = compare(
        _sum_df(spark),
        oracle,
        "SELECT CAST(SUM(n_chars) + 1 AS BIGINT) AS total_chars FROM documents",
    )
    assert any("values differ" in p for p in problems)
