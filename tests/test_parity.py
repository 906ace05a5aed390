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


def test_eval_tail_rationale_keys_unique_and_registered():
    """The rotation ledger is a dict LITERAL: a duplicate key (e.g.
    re-parking a query that is already in the tail) silently shadows
    the earlier rationale and shifts the window by one without any
    error. Parse the source and reject duplicates; also require every
    rationale to name a registered query, and the window to be exactly
    the driver's 50 slots."""
    import ast
    import collections
    import pathlib

    import dump1090_stream_parser_spark.operators as ops

    src = pathlib.Path(ops.__file__).read_text()
    keys = None
    for node in ast.walk(ast.parse(src)):
        target = getattr(node, "target", None) or (
            getattr(node, "targets", [None])[0]
        )
        if getattr(target, "id", "") == "EVAL_TAIL_RATIONALE":
            keys = [ast.literal_eval(k) for k in node.value.keys]
            break
    assert keys is not None
    dupes = [k for k, c in collections.Counter(keys).items() if c > 1]
    assert not dupes, f"duplicate EVAL_TAIL_RATIONALE keys: {dupes}"
    unknown = [k for k in keys if k not in ops.REGISTRY]
    assert not unknown, f"rationales for unregistered queries: {unknown}"
    names = list(ops.queries_map())
    in_window = set(names[:50])
    assert not in_window & set(keys), sorted(in_window & set(keys))
    assert len(names) - len(keys) == 50, (len(names), len(keys))
