"""Gold streams, parity sink, counters, and CLI surface (A7/A10/A13 +
SURVEY.md §2.2 streaming rows), all via file-replay + availableNow."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.cli import build_parser
from dump1090_stream_parser_spark.sources.sbs1 import parse_lines, silver
from dump1090_stream_parser_spark.streaming.monitor import IngestCounters
from dump1090_stream_parser_spark.streaming.pipeline import (
    bronze_from_file_replay,
    dedup_stream,
    flight_legs,
    hourly_message_rates,
    silver_stream,
    sliding_message_rates,
)
from dump1090_stream_parser_spark.streaming.sinks import write_sqlite_batch

from .test_sbs1_parser import GOLDEN

# Two aircraft, two flight legs each (>30 min gap), one duplicate squitter.
LEG_LINES = [
    "MSG,3,1,1,AAA111,1,2026/08/13,10:00:00.000,2026/08/13,10:00:00.000,,35000,,,51.1,-0.1,,,0,0,0,0",
    "MSG,3,1,1,AAA111,1,2026/08/13,10:05:00.000,2026/08/13,10:05:00.000,,35100,,,51.2,-0.2,,,0,0,0,0",
    "MSG,3,1,1,AAA111,1,2026/08/13,10:05:00.000,2026/08/13,10:05:00.000,,35100,,,51.2,-0.2,,,0,0,0,0",
    "MSG,3,1,1,AAA111,1,2026/08/13,12:00:00.000,2026/08/13,12:00:00.000,,36000,,,52.0,-1.0,,,0,0,0,0",
    "MSG,3,1,1,BBB222,1,2026/08/13,10:30:00.000,2026/08/13,10:30:00.000,,20000,,,48.0,2.0,,,0,0,0,0",
]


def _silver_from(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_lines(
        df, parsed_time=F.col("generated_ts")  # deterministic event time
    )
    return parsed


def _run_stream(spark, tmp_path, lines, transform, name):
    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    (src / "lines.txt").write_text("\n".join(lines) + "\n")
    bronze = bronze_from_file_replay(spark, str(src))
    parsed = parse_lines(bronze, parsed_time=F.col("generated_ts"))
    out = transform(silver(parsed))
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name in ("dedup", "enriched") else "complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_hourly_rates_stream(spark, tmp_path):
    res = _run_stream(
        spark, tmp_path, LEG_LINES, hourly_message_rates, "hourly"
    ).collect()
    got = {(r["hex_ident"], str(r["window"]["start"])): r["n_msgs"] for r in res}
    assert got[("AAA111", "2026-08-13 10:00:00")] == 3
    assert got[("AAA111", "2026-08-13 12:00:00")] == 1
    # 10:30 lands in the tumbling window that starts on the hour
    assert got[("BBB222", "2026-08-13 10:00:00")] == 1


def test_sliding_rates_stream(spark, tmp_path):
    res = _run_stream(
        spark, tmp_path, LEG_LINES, sliding_message_rates, "sliding"
    ).collect()
    # the 10:05 duplicate pair lands in 10 sliding panes (10m window, 1m slide)
    panes = [r for r in res if r["hex_ident"] == "AAA111" and r["n_msgs"] >= 2]
    assert len(panes) >= 5


def test_flight_legs_sessionization(spark, tmp_path):
    res = _run_stream(spark, tmp_path, LEG_LINES, flight_legs, "legs").collect()
    by_ac = {}
    for r in res:
        by_ac.setdefault(r["hex_ident"], []).append(r)
    assert len(by_ac["AAA111"]) == 2  # >30min gap splits the legs
    assert len(by_ac["BBB222"]) == 1
    first_leg = min(by_ac["AAA111"], key=lambda r: r["leg_start"])
    assert first_leg["n_msgs"] == 3


def test_dedup_stream_drops_duplicate_squitter(spark, tmp_path):
    res = _run_stream(spark, tmp_path, LEG_LINES, dedup_stream, "dedup").collect()
    assert len(res) == len(LEG_LINES) - 1  # exactly the dup dropped


def test_sqlite_parity_sink(spark, tmp_path):
    silver_df = silver(_silver_from(spark, GOLDEN))
    db = str(tmp_path / "adsb_messages.db")
    n = write_sqlite_batch(silver_df, db)
    assert n == len(GOLDEN)
    conn = sqlite3.connect(db)
    rows = conn.execute(
        "SELECT message_type, transmission_type, hex_ident, squawk "
        "FROM squitters ORDER BY transmission_type"
    ).fetchall()
    assert len(rows) == len(GOLDEN)
    assert rows[0][0] == "MSG" and rows[0][1] == 1
    assert rows[5][3] == "7000"  # squawk stays TEXT, zeros preserved
    # second batch appends (reference semantics), same tx boundary
    write_sqlite_batch(silver_df, db)
    assert conn.execute("SELECT COUNT(*) FROM squitters").fetchone()[0] == 2 * len(GOLDEN)
    conn.close()


def test_ingest_counters_listener(spark, tmp_path):
    counters = IngestCounters()
    spark.streams.addListener(counters)
    try:
        src = tmp_path / "cin"
        src.mkdir()
        (src / "l.txt").write_text("\n".join(GOLDEN) + "\n")
        bronze = bronze_from_file_replay(spark, str(src))
        q = (
            silver_stream(bronze)
            .writeStream.format("memory")
            .queryName("counted")
            .option("checkpointLocation", str(tmp_path / "cckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are async; poll briefly
        import time

        deadline = time.time() + 20
        while counters.count_total < len(GOLDEN) and time.time() < deadline:
            time.sleep(0.5)
        assert counters.count_total == len(GOLDEN)
    finally:
        spark.streams.removeListener(counters)


def test_cli_mirrors_reference_options():
    p = build_parser()
    args = p.parse_args(
        ["-l", "feed.local", "-p", "30003", "-d", "/tmp/out",
         "--buffer-size", "4096", "--connect-attempt-limit", "3"]
    )
    assert args.location == "feed.local"
    assert args.port == 30003
    assert args.buffer_size == 4096
    assert args.connect_attempt_limit == 3
    assert args.connect_attempt_delay == 5.0  # reference default


def test_sqlite_sink_skips_replayed_batch(spark, tmp_path):
    silver_df = silver(_silver_from(spark, GOLDEN))
    db = str(tmp_path / "idem.db")
    assert write_sqlite_batch(silver_df, db, batch_id=3) == len(GOLDEN)
    assert write_sqlite_batch(silver_df, db, batch_id=3) == 0  # replay
    assert write_sqlite_batch(silver_df, db, batch_id=4) == len(GOLDEN)
    conn = sqlite3.connect(db)
    n = conn.execute("SELECT COUNT(*) FROM squitters").fetchone()[0]
    conn.close()
    assert n == 2 * len(GOLDEN)


def test_stream_static_enrichment_join(spark, tmp_path):
    from dump1090_stream_parser_spark.streaming.pipeline import (
        enrich_with_registry,
    )

    registry = spark.createDataFrame(
        [("AAA111", "B738", "Acme Air"), ("CCC333", "A320", "Other")],
        "hex_ident string, type_code string, operator string",
    )
    res = _run_stream(
        spark,
        tmp_path,
        LEG_LINES,
        lambda s: enrich_with_registry(s, registry),
        "enriched",
    ).collect()
    by_ac = {r["hex_ident"]: r for r in res}
    assert by_ac["AAA111"]["type_code"] == "B738"
    assert by_ac["BBB222"]["type_code"] is None  # left join keeps unknowns


# MSG,1 identity messages + MSG,3 positions: AAA111 has a callsign 5 min
# before each of its first two positions (within the 10-min join gap), a
# THIRD position 2h later (outside any gap -> dropped by the interval
# join), and BBB222 has a position but no identity message at all.
SS_JOIN_LINES = [
    "MSG,1,1,1,AAA111,1,2026/08/13,09:55:00.000,2026/08/13,09:55:00.000,JET42,,,,,,,,,,,",
    "MSG,3,1,1,AAA111,1,2026/08/13,10:00:00.000,2026/08/13,10:00:00.000,,35000,,,51.1,-0.1,,,0,0,0,0",
    "MSG,3,1,1,AAA111,1,2026/08/13,10:04:00.000,2026/08/13,10:04:00.000,,35100,,,51.2,-0.2,,,0,0,0,0",
    "MSG,3,1,1,AAA111,1,2026/08/13,12:30:00.000,2026/08/13,12:30:00.000,,36000,,,52.0,-1.0,,,0,0,0,0",
    "MSG,3,1,1,BBB222,1,2026/08/13,10:30:00.000,2026/08/13,10:30:00.000,,20000,,,48.0,2.0,,,0,0,0,0",
]


def test_stream_stream_interval_join(spark, tmp_path):
    from dump1090_stream_parser_spark.streaming.pipeline import (
        join_position_with_callsign,
    )

    out = _run_stream(
        spark, tmp_path, SS_JOIN_LINES,
        join_position_with_callsign, "enriched",
    )
    rows = {
        (r.hex_ident, str(r.pos_time), r.callsign) for r in out.collect()
    }
    assert rows == {
        ("AAA111", "2026-08-13 10:00:00", "JET42"),
        ("AAA111", "2026-08-13 10:04:00", "JET42"),
    }


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Outer results only emit when the watermark passes a row's join
    window, so the replay ships a second file whose late event advances
    the watermark past every earlier position."""
    import functools

    from dump1090_stream_parser_spark.streaming.pipeline import (
        bronze_from_file_replay,
        join_position_with_callsign,
    )
    from dump1090_stream_parser_spark.sources.sbs1 import parse_lines, silver

    src = tmp_path / "in"
    src.mkdir()
    (src / "a_lines.txt").write_text("\n".join(SS_JOIN_LINES) + "\n")
    # Watermark pushers: far-future positions (their own unmatched rows
    # may legitimately stay in state when the stream ends). Two of them:
    # the watermark computed from batch N only takes effect in batch
    # N+1, and evicted outer rows only emit in a batch that runs AFTER
    # the watermark passed them.
    # NB: the global watermark is the MIN across both sides' columns,
    # so each pusher must advance the position AND the callsign stream.
    (src / "b_push.txt").write_text(
        "MSG,3,1,1,CCC333,1,2026/08/14,12:00:00.000,2026/08/14,"
        "12:00:00.000,,10000,,,40.0,3.0,,,0,0,0,0\n"
        "MSG,1,1,1,CCC333,1,2026/08/14,12:00:00.000,2026/08/14,"
        "12:00:00.000,CARGO1,,,,,,,,,,,\n"
    )
    (src / "c_push.txt").write_text(
        "MSG,3,1,1,DDD444,1,2026/08/15,12:00:00.000,2026/08/15,"
        "12:00:00.000,,10000,,,41.0,4.0,,,0,0,0,0\n"
        "MSG,1,1,1,DDD444,1,2026/08/15,12:00:00.000,2026/08/15,"
        "12:00:00.000,CARGO2,,,,,,,,,,,\n"
    )
    # one file per micro-batch: maxFilesPerTrigger is a SOURCE option
    bronze = (
        spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    )
    parsed = parse_lines(bronze, parsed_time=F.col("generated_ts"))
    out = join_position_with_callsign(silver(parsed), how="left_outer")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.hex_ident, str(r.pos_time), r.callsign)
        for r in spark.sql("SELECT * FROM ss_outer").collect()
    }
    # In-gap positions join; the 12:30 position and callsign-less
    # BBB222 emit with NULL callsign once the watermark passes them.
    assert ("AAA111", "2026-08-13 10:00:00", "JET42") in rows
    assert ("AAA111", "2026-08-13 10:04:00", "JET42") in rows
    assert ("AAA111", "2026-08-13 12:30:00", None) in rows
    assert ("BBB222", "2026-08-13 10:30:00", None) in rows


def test_sql_cli_queries_ingested_squitters(spark, tmp_path, capsys, monkeypatch):
    """The reference workflow's query half: after an ingest run, the
    sqlite3-shell analog must answer SQL over the `squitters` view
    from the parquet layout (batch_id + parsed_date partitions)."""
    from dump1090_stream_parser_spark.sql_cli import main as sql_main
    from dump1090_stream_parser_spark.streaming.pipeline import (
        silver_batch_writer,
    )

    out = tmp_path / "adsb_out"
    batch = spark.createDataFrame([(l,) for l in LEG_LINES], "value string")
    parsed = parse_lines(batch, parsed_time=F.col("generated_ts"))
    silver_batch_writer(str(out))(parsed, 0)

    sql_main(
        [
            "-d",
            str(out),
            "--master",
            "local[2]",
            "SELECT hex_ident, COUNT(*) AS n FROM squitters "
            "GROUP BY hex_ident ORDER BY n DESC, hex_ident",
        ]
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "hex_ident,n"
    assert lines[1] == "AAA111,4"
    assert lines[2] == "BBB222,1"
