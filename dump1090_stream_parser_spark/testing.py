"""Cross-engine comparison utilities (local mimic of the driver's gate).

The driver compares row-count + schema + order-insensitive value-hash
between each ``queries()`` entry and its ``oracle_sql()`` twin. These
helpers implement a stricter local version: exact cell-string equality
after canonicalization, so anything passing here should pass the gate.
"""

from __future__ import annotations

import math

import duckdb

from .tables import TABLES


def canon(v) -> str:
    """Canonical string for one cell (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_multiset(cols: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def duckdb_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the testdata views the driver registers."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        sm, dm = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return problems
