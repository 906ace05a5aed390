"""Every registered query must match its DuckDB oracle at sf0.001
(the driver gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from dump1090_stream_parser_spark.testing import compare

from .conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "n_msgs"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        return
    problems = compare(df, oracle, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)
