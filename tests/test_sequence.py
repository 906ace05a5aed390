"""Markov transition matrix (operators/sequence.py): third-engine
check -- recompute in pure Python, pin row-stochastic invariant."""

from __future__ import annotations

import math
from collections import defaultdict

from dump1090_stream_parser_spark.operators.sequence import q_transitions
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_transitions_match_python(spark):
    got = {
        (r["prev_type"], r["next_type"]): r
        for r in q_transitions(spark, SF_DIR).collect()
    }
    assert got, "transition cells expected"

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts: dict[tuple, int] = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, prev), (_, _, nxt) in zip(seq, seq[1:]):
            counts[(prev, nxt)] += 1
    assert set(counts) == set(got)
    row_totals: dict[str, int] = defaultdict(int)
    for (prev, _), c in counts.items():
        row_totals[prev] += c
    for key, c in counts.items():
        g = got[key]
        assert g["n_trans"] == c
        assert g["row_total"] == row_totals[key[0]]
        assert math.isclose(
            g["p"], c / row_totals[key[0]], rel_tol=1e-9, abs_tol=5.01e-7
        )


def test_transitions_rows_sum_to_one(spark):
    rows = q_transitions(spark, SF_DIR).collect()
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev_type"]] += r["n_trans"] / r["row_total"]
    for prev, total in by_prev.items():
        assert math.isclose(total, 1.0, rel_tol=1e-12), prev


def test_paths_match_python(spark):
    import math

    from dump1090_stream_parser_spark.operators.sequence import (
        TOP_PATHS,
        q_paths,
    )

    got = [
        (r["t1"], r["t2"], r["t3"], r["n_paths"], r["share"])
        for r in q_paths(spark, SF_DIR).collect()
    ]
    assert 0 < len(got) <= TOP_PATHS

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts: dict[tuple, int] = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[tuple(types[i:i + 3])] += 1
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [
        (t1, t2, t3, c, round(c / total, 6))
        for (t1, t2, t3), c in ranked[:TOP_PATHS]
    ]
    assert [g[:4] for g in got] == [e[:4] for e in expect]
    for g, e in zip(got, expect):
        assert math.isclose(g[4], e[4], rel_tol=0, abs_tol=1.01e-6)
    assert math.isclose(
        sum(c for c in counts.values()) / total, 1.0, rel_tol=1e-12
    )


def test_streaks_match_python(spark):
    from datetime import timedelta

    from dump1090_stream_parser_spark.operators.sequence import (
        TOP_STREAKS,
        q_streaks,
    )

    got = [
        (r["user_id"], r["best_streak"], r["n_streaks"],
         r["active_days"], r["best_start"].date())
        for r in q_streaks(spark, SF_DIR).collect()
    ]
    assert 0 < len(got) <= TOP_STREAKS

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts")
        .collect()
    )
    days = defaultdict(set)
    for r in rows:
        days[r["user_id"]].add(r["ts"].date())
    profile = {}
    for uid, ds in days.items():
        ordered = sorted(ds)
        streaks = []
        start = prev = ordered[0]
        for d in ordered[1:]:
            if d == prev + timedelta(days=1):
                prev = d
                continue
            streaks.append((start, (prev - start).days + 1))
            start = prev = d
        streaks.append((start, (prev - start).days + 1))
        best = max(l for _, l in streaks)
        best_start = min(s for s, l in streaks if l == best)
        profile[uid] = (
            best,
            len(streaks),
            sum(l for _, l in streaks),
            best_start,
        )
        # identity: streak lengths partition the distinct-day set
        assert sum(l for _, l in streaks) == len(ds)
    expect = sorted(
        ((uid, *p) for uid, p in profile.items()),
        key=lambda t: (-t[1], t[0]),
    )[:TOP_STREAKS]
    assert got == expect
