"""Blocked fuzzy join (operators/linkage.py): block recall against the
unblocked all-pairs ground truth, and multiplicity accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.linkage import (
    MAX_EDIT_DISTANCE,
    q_fuzzy_join,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocked_pairs_exact_and_recall_measured(spark):
    """Every blocked pair must be a true all-pairs match (precision 1
    by construction -- the distance is exact inside blocks), and the
    blocking contract's recall vs unblocked ground truth is measured
    and floored at fixture scale."""
    got = {
        (r["name_a"], r["name_b"]): r
        for r in q_fuzzy_join(spark, SF_DIR).collect()
    }
    names = {
        r["p_name"]: int(r["n"])
        for r in load_table(spark, SF_DIR, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    all_pairs = set()
    ordered = sorted(names)
    for i, na in enumerate(ordered):
        for nb in ordered[i + 1:]:
            if _lev(na, nb) <= MAX_EDIT_DISTANCE:
                all_pairs.add((na, nb))
    assert all_pairs, "fixture must contain fuzzy matches"
    # precision: every emitted pair is a ground-truth match with the
    # right distance and multiplicities
    for (na, nb), r in got.items():
        assert (na, nb) in all_pairs
        assert r["dist"] == _lev(na, nb)
        assert r["n_parts_a"] == names[na]
        assert r["n_parts_b"] == names[nb]
        assert r["n_row_pairs"] == names[na] * names[nb]
    # recall contract: exactly the same-block subset, and not vacuous
    same_block = {
        (a, b)
        for a, b in all_pairs
        if a.split(" ")[-1] == b.split(" ")[-1]
    }
    assert set(got) == same_block
    recall = len(got) / len(all_pairs)
    assert recall >= 0.5, f"block recall collapsed: {recall:.2f}"
