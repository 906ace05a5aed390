"""CDC changelog apply (operators/cdc.py): pure-Python recompute of
the live view + the two-phase incremental-merge equivalence."""

from __future__ import annotations

from dump1090_stream_parser_spark.operators.cdc import (
    apply_changelog,
    changelog_state,
    merge_states,
    q_cdc_apply,
)
from dump1090_stream_parser_spark.tables import load_table
from pyspark.sql import functions as F

from .conftest import SF_DIR

_OPS = {"signup": "I", "error": "D"}


def _log_rows(spark):
    return [
        (
            r["user_id"],
            r["ts"],
            r["event_id"],
            _OPS.get(r["event_type"], "U"),
            r["value"],
        )
        for r in load_table(spark, SF_DIR, "events").collect()
    ]


def test_cdc_live_view_matches_python(spark):
    got = {r["user_id"]: r for r in q_cdc_apply(spark, SF_DIR).collect()}
    assert got, "live keys expected"

    by_key: dict[int, list] = {}
    for uid, ts, eid, op, value in _log_rows(spark):
        by_key.setdefault(uid, []).append((ts, eid, op, value))
    live = 0
    for uid, ops in by_key.items():
        ops.sort()
        ts, eid, op, value = ops[-1]
        n_del = sum(1 for o in ops if o[2] == "D")
        if op == "D":
            assert uid not in got
            continue
        live += 1
        g = got[uid]
        assert (g["n_ops"], g["n_deletes"]) == (len(ops), n_del)
        assert g["last_op"] == op and g["last_ts"] == ts
        assert g["current_value"] == value
    assert live == len(got)


def test_cdc_two_phase_merge_equals_direct(spark):
    events = load_table(spark, SF_DIR, "events")
    log = events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CASE WHEN event_type = 'signup' THEN 'I'"
            " WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
        ).alias("op"),
        "value",
    )
    mid = log.agg(
        F.percentile_approx("ts", F.lit(0.5)).alias("m")
    ).collect()[0]["m"]
    older = log.filter(F.col("ts") <= F.lit(mid))
    newer = log.filter(F.col("ts") > F.lit(mid))
    assert older.count() > 0 and newer.count() > 0

    direct = {tuple(r) for r in changelog_state(log).collect()}
    merged = {
        tuple(r)
        for r in merge_states(
            changelog_state(older), changelog_state(newer)
        ).collect()
    }
    assert merged == direct


def test_cdc_tombstones_kept_in_state_dropped_in_view(spark):
    events = load_table(spark, SF_DIR, "events")
    log = events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CASE WHEN event_type = 'signup' THEN 'I'"
            " WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
        ).alias("op"),
        "value",
    )
    state = changelog_state(log)
    dead = state.filter(F.col("last_op") == "D").count()
    assert state.count() == dead + apply_changelog(log).count()
