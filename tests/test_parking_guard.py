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
