"""Round-8 advisor regression tests (ADVICE.md, round 7).

Four findings, all in the "graceful degradation / cross-engine rounding"
class: lang-id must survive corpus lang drift with full oracle parity,
the streaming sampler must not divide by zero on empty docs, and the
stream-side HALF_UP quantization must round the shortest decimal repr
(the JVM BigDecimal.valueOf path), not the exact binary expansion.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dump1090_stream_parser_spark.operators.registry import REGISTRY
from dump1090_stream_parser_spark.tables import TABLES
from dump1090_stream_parser_spark.testing import compare

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory):
    """sf0.001 with five extra documents in an out-of-catalog lang."""
    d = tmp_path_factory.mktemp("langdrift")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')
          UNION ALL
          SELECT * FROM (
            SELECT doc_id + 1000000 AS doc_id, text, 'xx' AS lang,
                   source, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')
            ORDER BY doc_id LIMIT 5
          )
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_lang_id_survives_unknown_lang(spark, drift_dir):
    """An out-of-catalog lang must neither crash the profile pass
    (round-7 advisor: lang_index[lang] raised KeyError executor-side)
    nor break oracle parity -- the oracle's profile CTE groups observed
    langs, so the Spark path must too."""
    entry = REGISTRY["q_lang_id"]
    df = entry.fn(spark, drift_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{drift_dir}/{t}.parquet')"
        )
    problems = compare(df, con, entry.oracle)
    con.close()
    assert not problems, "; ".join(problems)
    langs = {r["lang"] for r in df.collect()}
    assert "xx" in langs  # the drifted docs surfaced, not silently lost


def test_es_priority_zero_length_doc():
    """n_chars=0 -> w=0: the batch engines evaluate u^(1.0/0.0) =
    u^Infinity = 0.0 for u < 1; the Python path must return that limit
    instead of raising ZeroDivisionError (round-7 advisor)."""
    from dump1090_stream_parser_spark.streaming.weighted_sample import (
        es_priority,
    )

    assert es_priority(12345, 0) == 0.0
    assert es_priority(12345, 1) > 0.0


def test_es_priority_quantizes_shortest_repr():
    """The quantize input must be the shortest decimal repr: a double
    whose shortest repr ties exactly on the 1e-6 halfway point rounds
    HALF_UP there, while its exact binary expansion sits below the
    halfway point and would round down."""
    from decimal import ROUND_HALF_UP, Decimal

    x = 0.1234565  # exact binary expansion is 0.12345649999999999...
    via_repr = float(
        Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )
    via_binary = float(
        Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )
    assert via_repr == 0.123457  # the JVM BigDecimal.valueOf answer
    assert via_binary == 0.123456  # the bug class the fix removes
