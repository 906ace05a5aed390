"""q_compaction_plan: deterministic small-file bin packing.

The registry parity gate pins Spark == DuckDB; these legs pin the
PLAN'S semantics against a pure-Python greedy recomputation and the
invariants a rewrite job relies on: dense bin ids, conservation, and
the one-straddling-fragment oversize bound.
"""

from __future__ import annotations

from collections import defaultdict

from dump1090_stream_parser_spark.operators.pipeline_ops import (
    COMPACT_TARGET_ROWS,
    q_compaction_plan,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_compaction_plan_matches_greedy_python(spark):
    rows = q_compaction_plan(spark, SF_DIR).collect()
    assert rows
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("date_trunc('day', ts) AS d", "hour(ts) AS hr")
        .collect()
    )
    inv: dict = defaultdict(int)
    for r in ev:
        inv[(r["d"], r["hr"])] += 1
    # greedy recompute: largest-first exclusive-cumsum bucketing
    by_part = defaultdict(list)
    for (d, hr), n in inv.items():
        by_part[d].append((n, hr))
    expect = {}
    for d, frags in by_part.items():
        cum = 0
        for n, hr in sorted(frags, key=lambda t: (-t[0], t[1])):
            expect[(d, hr)] = (n, cum // COMPACT_TARGET_ROWS)
            cum += n
    got = {(r["d"], r["hr"]): (r["size_rows"], r["out_bin"]) for r in rows}
    assert got == expect

    # invariants per partition: dense bins from 0, conservation,
    # straddle bound (a bin exceeds target only via its last-placed
    # straddling fragment, so bin_rows < target + max fragment size)
    bins = defaultdict(lambda: [0, 0])  # (d, bin) -> [rows, frags]
    for r in rows:
        b = bins[(r["d"], r["out_bin"])]
        b[0] += r["size_rows"]
        b[1] += 1
    for (d, bin_id), (brows, bfrags) in bins.items():
        max_frag = max(n for (dd, _), (n, _b) in expect.items() if dd == d)
        assert brows < COMPACT_TARGET_ROWS + max_frag, (d, bin_id)
    for d in by_part:
        ids = sorted({b for (dd, _), (_, b) in expect.items() if dd == d})
        assert ids == list(range(len(ids))), d
    for r in rows:
        assert r["bin_rows"] == bins[(r["d"], r["out_bin"])][0]
        assert r["bin_frags"] == bins[(r["d"], r["out_bin"])][1]


def test_skew_profile_matches_python_and_salt_levels(spark):
    """Third-engine recompute of the skew profile plus the salt
    algebra: top_share * n / salt_factor <= n / SKEW_TARGET_TASKS
    (the recommended factor levels the heaviest key to at most the
    target per-task share), and a near-uniform key recommends ~1."""
    import math
    from collections import Counter

    from dump1090_stream_parser_spark.operators.pipeline_ops import (
        SKEW_TARGET_TASKS,
        q_skew_profile,
    )

    got = {r["key_name"]: r for r in q_skew_profile(spark, SF_DIR).collect()}
    assert set(got) == {"user_id", "event_type", "day"}
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "CAST(user_id AS STRING) AS u",
            "event_type AS t",
            "CAST(CAST(ts AS DATE) AS STRING) AS d",
        )
        .collect()
    )
    for key_name, vals in (
        ("user_id", [r["u"] for r in ev]),
        ("event_type", [r["t"] for r in ev]),
        ("day", [r["d"] for r in ev]),
    ):
        c = Counter(vals)
        r = got[key_name]
        assert r["n_distinct"] == len(c)
        assert r["n"] == len(vals)
        assert r["top_n"] == max(c.values())
        share = max(c.values()) / len(vals)
        assert math.isclose(
            r["top_share"], share, rel_tol=0, abs_tol=5.01e-7
        )
        assert r["salt_factor"] == math.ceil(share * SKEW_TARGET_TASKS)
        # the recommendation levels the top key to <= target share
        assert share / r["salt_factor"] <= 1.0 / SKEW_TARGET_TASKS + 1e-12
