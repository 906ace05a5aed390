"""Parallel SQLite batch source (sources/sqlite_source.py): rowid-range
partitioned scans must reproduce the table exactly, split work across
the requested partitions, infer the affinity schema, and apply the
NULL-on-garbage policy to dynamically-typed values."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.sources.sqlite_source import (
    register_sqlite_source,
)


def _make_db(path, n=1000):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE squitters ("
        "message_type TEXT, hex_ident TEXT, altitude INTEGER,"
        "ground_speed REAL, parsed_time TEXT)"
    )
    con.executemany(
        "INSERT INTO squitters VALUES (?,?,?,?,?)",
        [
            (
                "MSG",
                f"A{i % 37:05X}",
                i * 25 if i % 3 else None,
                i * 0.5,
                f"2026-08-14 12:{i % 60:02d}:00",
            )
            for i in range(n)
        ],
    )
    con.commit()
    con.close()


def test_sqlite_source_parallel_scan_round_trip(spark, tmp_path):
    db = str(tmp_path / "adsb.db")
    _make_db(db, n=1000)
    register_sqlite_source(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", "squitters")
        .option("numPartitions", "8")
        .load()
    )
    # inferred affinity schema
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "string", "bigint", "double", "string",
    ]
    # genuine scan parallelism
    assert df.rdd.getNumPartitions() == 8
    # exact round trip
    assert df.count() == 1000
    got = df.agg(
        F.sum("altitude"), F.count("altitude"), F.sum("ground_speed")
    ).collect()[0]
    con = sqlite3.connect(db)
    exp = con.execute(
        "SELECT SUM(altitude), COUNT(altitude), SUM(ground_speed)"
        " FROM squitters"
    ).fetchone()
    con.close()
    assert (got[0], got[1]) == (exp[0], exp[1])
    assert abs(got[2] - exp[2]) < 1e-9
    # spot-check row content incl. NULLs
    r = df.filter(F.col("hex_ident") == "A00000").orderBy("parsed_time")
    assert r.count() == 1000 // 37 + 1
    assert df.filter(F.col("altitude").isNull()).count() == 1000 // 3 + 1


def test_sqlite_source_null_on_garbage_and_empty(spark, tmp_path):
    db = str(tmp_path / "messy.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER, b REAL)")
    # SQLite happily stores TEXT in INTEGER columns; the source must
    # NULL it, not die
    con.execute("INSERT INTO t VALUES ('not-a-number', 'nope')")
    con.execute("INSERT INTO t VALUES (42, 1.5)")
    con.commit()
    con.close()
    register_sqlite_source(spark)

    def read(table, path=db):
        return (
            spark.read.format("sqlite")
            .option("path", path)
            .option("table", table)
            .load()
        )

    rows = sorted(
        read("t").collect(), key=lambda r: (r["a"] is None, r["a"])
    )
    assert (rows[0]["a"], rows[0]["b"]) == (42, 1.5)
    assert (rows[1]["a"], rows[1]["b"]) == (None, None)

    # empty table: zero rows, not an error
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE empty (x INTEGER)")
    con.commit()
    con.close()
    assert read("empty").count() == 0


def test_sql_cli_joins_sqlite_history_with_silver(spark, tmp_path, capsys):
    """Migration workflow: the SQL CLI can query a reference-written
    .db (as squitters_db) -- e.g. to count history rows -- through the
    parallel sqlite source."""
    from dump1090_stream_parser_spark.sql_cli import main as sql_main

    db = str(tmp_path / "history.db")
    _make_db(db, n=200)
    sql_main(
        [
            "-d",
            str(tmp_path / "no_silver_yet"),
            "--sqlite-db",
            db,
            "--master",
            "local[2]",
            "SELECT COUNT(*) AS n, COUNT(DISTINCT hex_ident) AS aircraft "
            "FROM squitters_db",
        ]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "n,aircraft"
    assert lines[1] == "200,37"


def test_sqlite_source_without_rowid_and_quoted_identifiers(
    spark, tmp_path
):
    """Hardening (ADVICE r4): WITHOUT ROWID tables have no implicit
    partition key -- the source must degrade to one correct full-scan
    partition, not fail; and identifiers containing spaces/quotes must
    be quoted, not interpolated raw."""
    db = str(tmp_path / "odd.db")
    con = sqlite3.connect(db)
    con.execute(
        'CREATE TABLE "flight log" '
        '("hex ident" TEXT, "alt ""ft""" INTEGER, PRIMARY KEY ("hex ident"))'
        " WITHOUT ROWID"
    )
    con.executemany(
        'INSERT INTO "flight log" VALUES (?,?)',
        [(f"A{i:05X}", i * 25) for i in range(100)],
    )
    con.commit()
    con.close()

    register_sqlite_source(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", "flight log")
        .option("numPartitions", "8")
        .load()
    )
    assert df.columns == ["hex ident", 'alt "ft"']
    assert df.rdd.getNumPartitions() == 1  # fallback: no implicit rowid
    assert df.count() == 100
    assert df.agg(F.sum(F.col('`alt "ft"`'))).first()[0] == sum(
        i * 25 for i in range(100)
    )


def test_sqlite_source_user_rowid_column_falls_back(spark, tmp_path):
    """A declared column literally named rowid shadows the implicit key;
    range-partitioning on it would partition user data -- the source
    must detect the shadowing and fall back to a single full scan."""
    db = str(tmp_path / "shadow.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (rowid INTEGER, val TEXT)")
    # user 'rowid' values deliberately NOT contiguous from 1
    con.executemany(
        "INSERT INTO t VALUES (?,?)",
        [(i * 1000, f"v{i}") for i in range(50)],
    )
    con.commit()
    con.close()

    register_sqlite_source(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", "t")
        .option("numPartitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 50
    assert df.agg(F.sum("rowid")).first()[0] == sum(
        i * 1000 for i in range(50)
    )


def test_sqlite_source_decoy_without_rowid_text_stays_parallel(
    spark, tmp_path
):
    """Hardening (ADVICE r5): a column name or CHECK literal containing
    the text 'without rowid' must NOT trip the WITHOUT-ROWID fallback --
    detection probes the implicit key itself, not the CREATE TABLE DDL,
    so an ordinary rowid table keeps its parallel range scan."""
    db = str(tmp_path / "decoy.db")
    con = sqlite3.connect(db)
    con.execute(
        'CREATE TABLE decoy ("notes without rowid" TEXT, '
        "kind TEXT CHECK (kind <> 'without rowid'))"
    )
    con.executemany(
        "INSERT INTO decoy VALUES (?,?)",
        [(f"n{i}", f"k{i}") for i in range(200)],
    )
    con.commit()
    con.close()

    register_sqlite_source(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", "decoy")
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # parallel scan preserved
    assert df.count() == 200
