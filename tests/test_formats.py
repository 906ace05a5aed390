"""CSV / JSON-lines interchange round trips (SURVEY.md §2.2
"Sinks/formats"): schema and values must survive write -> read exactly,
including the ''-vs-NULL distinction CSV usually destroys and the
nested array types CSV cannot carry."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dump1090_stream_parser_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _sorted_rows(df, key):
    return [r.asDict() for r in df.orderBy(key).collect()]


def test_csv_round_trip_preserves_schema_and_nulls(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(id=1, s="plain", x=1.5, flag=True),
            Row(id=2, s="", x=None, flag=False),  # empty string, NULL num
            Row(id=3, s=None, x=-0.25, flag=None),  # NULL string
            Row(id=4, s="comma, quote\" nl", x=2.0, flag=True),
        ],
        schema,
    )
    out = str(tmp_path / "csv")
    got = read_csv(spark, out, write_csv(df, out))
    assert got.schema == schema
    assert _sorted_rows(got, "id") == _sorted_rows(df, "id")


def test_csv_rejects_nested_columns(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="nested column 'embedding'"):
        write_csv(emb, str(tmp_path / "nope"))


def test_jsonl_round_trip_nested_and_events(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = str(tmp_path / "emb_jsonl")
    got = read_jsonl(spark, out, write_jsonl(emb, out))
    assert got.schema == emb.schema
    assert got.count() == emb.count()
    # value check incl. the float array: checksum both sides
    chk = lambda df: df.select(  # noqa: E731
        F.sum(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x)),
        F.sum("vec_id"),
    ).first()
    assert chk(got) == chk(emb)

    events = load_table(spark, SF_DIR, "events")
    out2 = str(tmp_path / "ev_jsonl")
    got2 = read_jsonl(spark, out2, write_jsonl(events, out2))
    assert got2.schema == events.schema  # timestamp type pinned by schema
    assert _sorted_rows(got2, "event_id") == _sorted_rows(events, "event_id")


def test_csv_round_trip_embedded_newlines(spark, tmp_path):
    """Quoted embedded newlines/CRs/tabs are legal CSV the writer
    emits; the reader must reassemble them (multiLine), not split rows
    mid-field."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(id=1, s="line1\nline2"),
            Row(id=2, s="tab\tand\rcr"),
            Row(id=3, s="\n\nleading and trailing\n"),
        ],
        schema,
    )
    out = str(tmp_path / "csv_nl")
    got = read_csv(spark, out, write_csv(df, out))
    assert _sorted_rows(got, "id") == _sorted_rows(df, "id")


def test_csv_null_sentinel_collision(spark, tmp_path):
    """Pin the documented CSV limitation: a string value equal to the
    NULL sentinel (the literal two chars ``\\N``) reads back as NULL --
    the reader compares tokens after unquoting/unescaping, so no write
    option can protect it (formats.py module docstring). JSON-lines
    round-trips the same value exactly; use it for such payloads."""
    df = spark.createDataFrame(
        [(1, "\\N"), (2, None), (3, "x")], "id int, s string"
    )
    path = str(tmp_path / "collide_csv")
    schema = write_csv(df, path)
    back = {r["id"]: r["s"] for r in read_csv(spark, path, schema).collect()}
    assert back == {1: None, 2: None, 3: "x"}  # documented collision

    jpath = str(tmp_path / "collide_jsonl")
    jschema = write_jsonl(df, jpath)
    jback = {
        r["id"]: r["s"] for r in read_jsonl(spark, jpath, jschema).collect()
    }
    assert jback == {1: "\\N", 2: None, 3: "x"}  # JSONL is exact


def test_orc_round_trip_nested_and_predicate_pushdown(spark, tmp_path):
    from dump1090_stream_parser_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    emb = load_table(spark, SF_DIR, "embeddings")  # nested array column
    out = str(tmp_path / "orc")
    got = read_orc(spark, out, write_orc(emb, out))
    assert got.schema == emb.schema
    assert got.count() == emb.count()
    # value spot check incl. the nested column
    a = emb.orderBy("vec_id").limit(5).collect()
    b = got.orderBy("vec_id").limit(5).collect()
    assert a == b
    # ORC scans take pushed filters like parquet scans do
    plan = got.filter(F.col("vec_id") < 10)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "vec_id" in plan
