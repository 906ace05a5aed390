"""Interchange formats beyond parquet: CSV and JSON-lines round trips.

The reference's only interchange surface is the SQLite file (SURVEY.md
§2.2 "Sinks/formats"); a Spark-native engine is expected to read and
write the lingua-franca text formats too. The subtlety both helpers own
is SCHEMA FIDELITY on re-read:

- CSV is untyped and flat-only: the reader must be given the writer's
  schema (never inferSchema -- sampling types from data is both a
  correctness risk and an extra full scan at 100 TB), and empty string
  vs NULL must round-trip distinguishably (the same ''-vs-NULL landmine
  as the SBS-1 Silver boundary, SURVEY.md §7.4). Nested columns
  (arrays/structs) are rejected loudly rather than silently stringified.

  KNOWN SENTINEL COLLISION (pinned by test_csv_null_sentinel_collision):
  a string value equal to the NULL sentinel itself -- the literal two
  chars ``\\N`` -- reads back as NULL. This is unfixable within Spark's
  CSV reader: the ``nullValue`` comparison happens AFTER unquoting and
  unescaping, so even ``quoteAll=true`` (measured: the writer emits
  ``"\\\\N"``) round-trips to NULL; no choice of sentinel escapes the
  same trap, it only moves it. ``\\N`` is kept because it is the
  PostgreSQL/Hive convention and is vanishingly rare as real data; use
  JSON-lines or parquet when payloads may contain it.
- JSON-lines carries nested types but not timestamp precision or
  int-width distinctions by itself; re-reading with the writer's schema
  (not inference) restores the exact DataFrame type surface.

Both writers emit one file per partition -- at scale these are the
splittable export/import formats (optionally compressed), and the read
path parallelizes per file exactly like parquet minus the columnar
pruning (hence: interchange, not analytics storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: CSV options that make '' vs NULL round-trip exactly: NULL serializes
#: as an unquoted sentinel, real empty strings as quoted empty fields.
#: The ``emptyValue`` knob is WRITE-side only -- setting it on the
#: reader would turn the quoted-empty field into the literal two-char
#: string ``""``.
#: The writer trims leading/trailing whitespace by DEFAULT (the reader
#: does not) -- silent data mangling for values like "\n\nx\n"; pin
#: both off on both sides.
_CSV_WRITE_OPTS = {
    "header": "true",
    "nullValue": "\\N",
    "emptyValue": '""',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
#: ``multiLine``: embedded newlines inside quoted fields are legal CSV
#: and the writer emits them; without this the reader splits such rows
#: mid-field (found by test_csv_round_trip_embedded_newlines). The cost
#: is per-FILE instead of per-line input splits -- acceptable for an
#: interchange format; keep files modest or use JSONL/parquet for bulk.
_CSV_READ_OPTS = {
    "header": "true",
    "nullValue": "\\N",
    "multiLine": "true",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def _flat_or_raise(schema: T.StructType) -> None:
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            raise ValueError(
                f"CSV cannot carry nested column '{f.name}' "
                f"({f.dataType.simpleString()}); use JSON-lines or parquet"
            )


def write_csv(df: DataFrame, path: str) -> T.StructType:
    """Write ``df`` as headered CSV; returns the schema the caller must
    hand to :func:`read_csv` (CSV itself is untyped)."""
    _flat_or_raise(df.schema)
    df.write.mode("overwrite").options(**_CSV_WRITE_OPTS).csv(path)
    return df.schema


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Typed CSV read with the writer's schema -- no inferSchema (an
    extra full pass over the data, and wrong on all-NULL columns)."""
    return spark.read.options(**_CSV_READ_OPTS).schema(schema).csv(path)


#: JSON's default timestamp rendering is millisecond-precision -- a
#: silent 3-digit truncation on round trip. Pin microsecond formats
#: (both zoned and NTZ variants) on writer AND reader.
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def write_jsonl(df: DataFrame, path: str) -> T.StructType:
    """Write ``df`` as JSON-lines (nested types supported)."""
    df.write.mode("overwrite").options(**_JSON_OPTS).json(path)
    return df.schema


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Typed JSON-lines read: the writer's schema pins int widths,
    float vs double, and timestamp types that inference would widen."""
    return spark.read.options(**_JSON_OPTS).schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> T.StructType:
    """Write ``df`` as ORC -- the second self-describing columnar
    format Spark ships a vectorized reader for. Full nested-type and
    timestamp fidelity like parquet (no option pinning needed); use it
    when the downstream consumer is Hive/Trino-centric where ORC's
    stripe statistics and bloom indexes are the native skipping unit.
    Returns the schema for symmetry with the other writers (ORC is
    self-describing, so :func:`read_orc` can also run schemaless)."""
    df.write.mode("overwrite").orc(path)
    return df.schema


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC read; pass the writer's schema to pin column order and get
    the same pruning-friendly explicit ReadSchema as the parquet path
    (schemaless read is fine for ad-hoc use -- ORC files carry types)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
