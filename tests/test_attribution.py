"""Last-touch attribution (operators/attribution.py): python replay of
the matching rule over the fixture, plus a constructed micro-corpus
that exercises the lookback expiry and same-timestamp tie-break."""

from __future__ import annotations

import duckdb

from dump1090_stream_parser_spark.operators.attribution import (
    LOOKBACK_US,
    q_attribution,
)
from dump1090_stream_parser_spark.operators.registry import REGISTRY
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _replay(rows):
    """Reference implementation: per-user scan in (us, event_id) order."""
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r[1:])
    agg: dict[str, list[int]] = {}
    for seq in by_user.values():
        touch = None
        for event_id, etype, us, cents in sorted(
            seq, key=lambda x: (x[2], x[0])
        ):
            if etype != "purchase":
                touch = (us, event_id, etype)
                continue
            if touch is not None and touch[0] >= us - LOOKBACK_US:
                ch, lag = touch[2], us - touch[0]
            else:
                ch, lag = "unattributed", None
            a = agg.setdefault(ch, [0, 0, 0])
            a[0] += 1
            a[1] += cents
            a[2] += lag or 0
    return agg


def test_attribution_matches_python_replay(spark):
    got = {
        r["channel"]: (
            r["n_conversions"],
            r["value_cents"],
            r["total_lag_us"] or 0,
        )
        for r in q_attribution(spark, SF_DIR).collect()
    }
    rows = [
        (
            r["user_id"],
            r["event_id"],
            r["event_type"],
            r["us"],
            r["cents"],
        )
        for r in load_table(spark, SF_DIR, "events")
        .filter(
            "user_id IS NOT NULL AND event_type IN"
            " ('view','click','purchase')"
        )
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(cast(ts as timestamp)) AS us",
            "cast(round(value * 100) as long) AS cents",
        )
        .collect()
    ]
    expect = {k: tuple(v) for k, v in _replay(rows).items()}
    assert got == expect
    assert {"view", "click"} & set(got), "no touch channel credited"


def test_attribution_lookback_and_tiebreak(spark, tmp_path):
    """Constructed corpus: an expired touch lands in unattributed, a
    same-timestamp pair resolves by event_id, and a touch AT the
    conversion row's (ts, event_id) position never credits itself."""
    day_us = 24 * 3600 * 1_000_000
    rows = [
        # user 1: click 8 days before purchase -> expired
        (1, 10, "click", 0, 0.0),
        (1, 11, "purchase", 8 * day_us, 5.0),
        # user 2: view then click at the SAME us -> higher event_id wins
        (2, 20, "view", 100, 0.0),
        (2, 21, "click", 100, 0.0),
        (2, 22, "purchase", 200, 7.0),
        # user 3: purchase with no touches at all
        (3, 30, "purchase", 50, 1.0),
    ]
    df = spark.createDataFrame(
        [
            (u, e, t, us, v)
            for (u, e, t, us, v) in rows
        ],
        "user_id long, event_id long, event_type string,"
        " us long, value double",
    ).selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "timestamp_micros(us) AS ts",
        "value",
        "cast(null as string) AS props",
    )
    d = tmp_path / "attr"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    got = {
        r["channel"]: (r["n_conversions"], r["value_cents"])
        for r in q_attribution(spark, str(d)).collect()
    }
    assert got == {
        "unattributed": (2, 600),  # expired + touchless
        "click": (1, 700),  # same-us tie -> event_id 21 beats 20
    }
    # the oracle agrees on the constructed corpus too
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{d}/events.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            REGISTRY["q_attribution"].oracle
        ).fetchall()
    }
    con.close()
    assert oracle == got
