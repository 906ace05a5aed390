"""Parallel batch reads from SQLite files: the ``sqlite`` data source.

The migration bridge in the OTHER direction from the drop-in SQLite
sink (streaming/sinks.py): a reference user arrives with years of
``adsb_messages.db`` history (Appendix A L36-L60 is the only schema the
reference ever writes), and backfilling it into the Spark world should
not mean a single-threaded dump. This source reads any SQLite table as
a Spark DataFrame with REAL scan parallelism:

- partition planning splits the table's implicit ``rowid`` key space
  into N contiguous ranges (one cheap ``MIN/MAX(rowid)`` probe at plan
  time), so each task opens the file read-only and scans only
  ``rowid BETWEEN lo AND hi`` -- an indexed range scan in SQLite, not a
  full-table pass per task. Tables with no usable implicit rowid
  (``WITHOUT ROWID``, or a declared column literally named rowid that
  would shadow it) are detected at plan time and fall back to a single
  full-scan partition -- correct, just not parallel;
- table and column names are always double-quoted (``_qident``), so
  identifiers containing spaces/quotes/metacharacters work and option
  values cannot splice SQL;
- the file must be reachable from every executor (local mode trivially;
  on a cluster: shared FS, or ship per-node copies) -- the same
  contract every file-based source has;
- schema: pass one explicitly (``.schema(...)``), or the source infers
  from ``PRAGMA table_info`` with SQLite's affinity map
  (INTEGER->long, REAL->double, BLOB->binary, else string). SQLite is
  dynamically typed per VALUE; the inferred schema casts via Python,
  so a TEXT value in an INTEGER column becomes NULL rather than
  killing the scan (the same NULL-on-garbage policy as the SBS-1
  parser).

No filter pushdown: SQLite's planner only helps on rowid here, and the
driver-side option surface should stay honest -- push predicates by
slicing rowid ranges upstream or filter in Spark (cheap, columnar).

Usage::

    spark.dataSource.register(SqliteDataSource)
    df = (spark.read.format("sqlite")
          .option("path", "/data/adsb_messages.db")
          .option("table", "squitters")
          .option("numPartitions", "8")
          .load())
"""

from __future__ import annotations

import sqlite3
from contextlib import closing
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _qident(name: str) -> str:
    """Double-quote a SQLite identifier (table/column name) so names
    containing spaces, quotes, or SQL metacharacters scan correctly and
    a hostile option value cannot splice SQL."""
    return '"' + name.replace('"', '""') + '"'


_AFFINITY = {
    "INT": LongType(),
    "INTEGER": LongType(),
    "BIGINT": LongType(),
    "REAL": DoubleType(),
    "DOUBLE": DoubleType(),
    "FLOAT": DoubleType(),
    "BLOB": BinaryType(),
}


def _ro_connect(path: str):
    """Read-only open, wrapped for ``with``-closing: sqlite3's native
    context manager only ends a TRANSACTION -- it leaves the connection
    (and its file handle) open, which in Spark's long-lived reused
    Python workers accumulates handles across tasks. ``closing`` makes
    ``with`` actually close."""
    return closing(sqlite3.connect(f"file:{path}?mode=ro", uri=True))


def _infer_schema(path: str, table: str) -> StructType:
    with _ro_connect(path) as con:
        cols = con.execute(f"PRAGMA table_info({_qident(table)})").fetchall()
    if not cols:
        raise ValueError(f"sqlite source: table {table!r} not found in {path}")
    fields = []
    for _, name, decl, *_ in cols:
        typ = _AFFINITY.get((decl or "").split("(")[0].upper(), StringType())
        fields.append(StructField(name, typ))
    return StructType(fields)


def _has_implicit_rowid(path: str, table: str) -> bool:
    """Partition planning keys on SQLite's implicit ``rowid``; that key
    does not exist for ``WITHOUT ROWID`` tables and is shadowed (refers
    to user data) when a declared column is literally named rowid. Both
    cases are detected at plan time and degrade to one full-scan
    partition instead of failing or mis-partitioning."""
    with _ro_connect(path) as con:
        cols = con.execute(f"PRAGMA table_info({_qident(table)})").fetchall()
        if any((c[1] or "").lower() == "rowid" for c in cols):
            return False  # declared column shadows the implicit key
        # Probe the key itself instead of substring-matching the CREATE
        # TABLE DDL (ADVICE r5: a column name or CHECK literal containing
        # "without rowid" would false-positive a DDL scan into the
        # single-partition fallback). SQLite validates the column at
        # prepare time, so this is exact and costs no row I/O.
        try:
            con.execute(f"SELECT rowid FROM {_qident(table)} LIMIT 1")
        except sqlite3.OperationalError:
            return False  # WITHOUT ROWID table: no implicit key
    return True


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SqliteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.table = options["table"]
        self.n = int(options.get("numpartitions", 4))
        self.schema = schema

    def partitions(self):
        if not _has_implicit_rowid(self.path, self.table):
            # WITHOUT ROWID table, or a user column shadowing rowid:
            # no usable implicit key -- one sequential full scan
            return [_RowidRange(None, None)]
        with _ro_connect(self.path) as con:
            lo, hi = con.execute(
                f"SELECT MIN(rowid), MAX(rowid) FROM {_qident(self.table)}"
            ).fetchone()
        if lo is None:  # empty table: one no-op partition
            return [_RowidRange(0, -1)]
        span = hi - lo + 1
        step = max(1, (span + self.n - 1) // self.n)
        return [
            _RowidRange(a, min(a + step - 1, hi))
            for a in range(lo, hi + 1, step)
        ]

    def read(self, part: _RowidRange) -> Iterator[tuple]:
        casts = []
        for f in self.schema.fields:
            if isinstance(f.dataType, LongType):
                casts.append(_to_long)
            elif isinstance(f.dataType, DoubleType):
                casts.append(_to_double)
            elif isinstance(f.dataType, BinaryType):
                casts.append(_to_bytes)
            else:
                casts.append(_to_str)
        cols = ", ".join(_qident(f.name) for f in self.schema.fields)
        sql = f"SELECT {cols} FROM {_qident(self.table)}"
        args: tuple = ()
        if part.lo is not None:  # rowid-range partition (the usual path)
            sql += " WHERE rowid BETWEEN ? AND ?"
            args = (part.lo, part.hi)
        with _ro_connect(self.path) as con:
            cur = con.execute(sql, args)
            for row in cur:
                yield tuple(c(v) for c, v in zip(casts, row))


# Value coercers: SQLite is dynamically typed per value; NULL-on-garbage
# rather than task failure (module-level so they pickle cheaply).
def _to_long(v):
    try:
        return int(v) if v is not None else None
    except (TypeError, ValueError):
        return None


def _to_double(v):
    try:
        return float(v) if v is not None else None
    except (TypeError, ValueError):
        return None


def _to_bytes(v):
    if v is None:
        return None
    return v if isinstance(v, (bytes, bytearray)) else str(v).encode()


def _to_str(v):
    return v if v is None or isinstance(v, str) else str(v)


class SqliteDataSource(DataSource):
    """``spark.read.format("sqlite")`` -- parallel rowid-range scans of
    a SQLite table (options: path, table, numPartitions)."""

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self) -> StructType:
        return _infer_schema(self.options["path"], self.options["table"])

    def reader(self, schema: StructType) -> SqliteReader:
        return SqliteReader(schema, dict(self.options))


def register_sqlite_source(spark) -> None:
    spark.dataSource.register(SqliteDataSource)
