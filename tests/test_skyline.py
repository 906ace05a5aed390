"""Pareto skyline (operators/skyline.py): brute-force O(n^2)
dominance ground truth in Python."""

from __future__ import annotations

from dump1090_stream_parser_spark.operators.skyline import q_skyline
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_skyline_matches_bruteforce(spark):
    got = {
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in q_skyline(spark, SF_DIR).collect()
    }
    assert got, "skyline rows expected"

    rows = [
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]
    expect = set()
    for key, size, price in rows:
        dominated = any(
            s2 <= size
            and p2 >= price
            and (s2 < size or p2 > price)
            for _, s2, p2 in rows
        )
        if not dominated:
            expect.add((key, size, price))
    assert got == expect
    # a larger size survives only by paying strictly more: the
    # frontier is strictly increasing in price as size grows
    frontier = sorted({(s, p) for _, s, p in got})
    for (s1, p1), (s2, p2) in zip(frontier, frontier[1:]):
        assert s1 < s2 and p1 < p2
