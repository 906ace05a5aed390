"""Mechanized parking-claims guard (tools/parking_guard.py, VERDICT r8
ask #5): every tail rationale's "code unchanged since its last green
driver row" claim is checked against git history, at function-block
granularity, every test run -- removing the one manual trust link in
the rotation protocol. A failure means a parked query's certified
source block (decorator + oracle + body) drifted after the round the
driver last hash-certified it: re-read the change, then stamp the
rationale with the block fingerprint the guard names."""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")


def test_no_unacknowledged_parked_drift():
    from parking_guard import check_parked

    violations = check_parked()
    assert violations == [], violations


def test_every_holder_chain_reaches_the_window():
    """Every parked rationale's holder-citation chain must terminate
    at a currently-in-window query (liveness is transitive: a holder
    that later parks names ITS holder). This is the structural
    invariant behind the rotation protocol -- no capability tier may
    be stranded with only parked representatives."""
    from parking_guard import holder_liveness

    stranded = holder_liveness()
    assert stranded == [], stranded


def test_guard_detects_block_granularity():
    """The guard must compare FUNCTION BLOCKS, not files: modules
    accrete new operators every round, and a file-level diff would
    flag every parked sibling. Pin the extractor on a module that
    changed this round around an unchanged parked query."""
    from parking_guard import _block

    src = subprocess.run(
        ["git", "show", "HEAD:dump1090_stream_parser_spark/operators/dedup.py"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    ).stdout
    blk = _block(src, "q_dedup_events")
    assert blk is not None
    assert blk.startswith("@query(")
    assert "def q_dedup_events(" in blk
    # the block ends before the next top-level section
    assert "q_dedup_incremental" not in blk.split("def ", 2)[-1]


def test_green_age_drain_rate_holds():
    """VERDICT r9 ask #2: the green-age bound. Every registry entry
    must earn a driver row at least once per MAX_GREEN_AGE rounds; the
    per-round enforceable form is the drain-rate invariant -- whenever
    parked entries are overdue, the window devotes at least the
    rotation quota (ceil(tail/MAX_GREEN_AGE) slots) to overdue
    entries, oldest first. A failure means the next rotation must
    bring the oldest parked entries back into the window."""
    from parking_guard import check_green_age

    violations = check_green_age()
    assert violations == [], violations


def test_window_round_is_current():
    """The registration stamp must track the ledger: WINDOW_ROUND is
    the round this window targets, and the ledger may be AT that round
    (mid-round) or one past it (new CORRECTNESS file just landed --
    rotation pending, a distinct signal, not a failure). Two or more
    past means a full driver round ran without a rotation, which
    check_green_age reports as a violation."""
    from parking_guard import current_round, window_round

    assert current_round() - window_round() <= 1


def test_drain_invariant_survives_round_boundary(tmp_path):
    """VERDICT r10 ask #2, the done-criterion: the suite must be green
    both BEFORE and AFTER a new CORRECTNESS ledger file lands. Simulate
    the drop: copy the real ledger into a temp dir, add a synthetic
    next-round file that greens every current-window entry, and assert
    (a) the drain invariant still holds (ages are judged at
    WINDOW_ROUND, not at the advanced ledger round), (b) the state is
    reported as rotation_pending, and (c) a ledger TWO rounds ahead
    becomes a loud stale-registration violation."""
    import json
    import shutil
    from pathlib import Path

    from parking_guard import (
        check_green_age,
        rotation_pending,
        window_round,
    )

    import dump1090_stream_parser_spark.operators as ops

    # green now (the real ledger), not yet pending
    assert check_green_age() == []

    ledger = tmp_path / "ledger"
    ledger.mkdir()
    for p in Path("/root/repo").glob("CORRECTNESS_r*.json"):
        shutil.copy(p, ledger / p.name)
    window = list(ops.queries_map())[:50]
    fake_green = {
        q: {"rows_match": True, "schema_match": True, "hash_match": True}
        for q in window
    }
    nxt = window_round()
    (ledger / f"CORRECTNESS_r{nxt}.json").write_text(json.dumps(fake_green))

    # the boundary state: ledger advanced, suite still green, signal up
    assert check_green_age(str(ledger)) == []
    assert rotation_pending(str(ledger))

    # a SECOND un-rotated round is the real violation
    (ledger / f"CORRECTNESS_r{nxt + 1}.json").write_text(
        json.dumps(fake_green)
    )
    stale = check_green_age(str(ledger))
    assert len(stale) == 1 and "full driver round" in stale[0]["reason"]


def test_rotation_quota_sustains_the_bound():
    """Sanity-pin the arithmetic the invariant rests on: draining
    `quota` entries per round cycles the whole tail within
    MAX_GREEN_AGE rounds, so the bound is achievable in steady state
    (not just asserted)."""
    import math

    from parking_guard import MAX_GREEN_AGE, rotation_quota

    import dump1090_stream_parser_spark.operators as ops

    tail = len(ops.queries_map()) - 50
    assert rotation_quota() == math.ceil(tail / MAX_GREEN_AGE)
    assert rotation_quota() * MAX_GREEN_AGE >= tail
