"""Market-basket co-occurrence (operators/basket.py): third-engine
check -- recompute the full ranked pair frame in pure Python."""

from __future__ import annotations

import math
from collections import defaultdict

from dump1090_stream_parser_spark.operators.basket import (
    MIN_CO,
    TOP_PAIRS,
    q_cooccur,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_cooccur_matches_python(spark):
    got = q_cooccur(spark, SF_DIR).collect()
    assert 0 < len(got) <= TOP_PAIRS

    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    freq: dict[int, int] = defaultdict(int)
    co: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        ordered = sorted(parts)
        for p in ordered:
            freq[p] += 1
        for i, p1 in enumerate(ordered):
            for p2 in ordered[i + 1:]:
                co[(p1, p2)] += 1
    nord = len(baskets)
    scored = []
    for (p1, p2), c in co.items():
        if c < MIN_CO:
            continue
        cos = c / math.sqrt(freq[p1] * freq[p2])
        lift = (c * nord) / (freq[p1] * freq[p2])
        scored.append((-cos, p1, p2, c, freq[p1], freq[p2], lift))
    scored.sort()
    # the engines cut the top-K on FULL-precision cosine; the emitted
    # column is round(6), so re-rank by the pair key on both sides
    # rather than by the rounded score
    expect = sorted(
        scored[:TOP_PAIRS], key=lambda t: (t[1], t[2])
    )
    assert len(got) == len(expect)
    for g, (ncos, p1, p2, c, n1, n2, lift) in zip(
        sorted(got, key=lambda r: (r["part1"], r["part2"])),
        expect,
    ):
        assert (g["part1"], g["part2"]) == (p1, p2)
        assert g["co_orders"] == c and g["n1"] == n1 and g["n2"] == n2
        assert math.isclose(g["cosine"], -ncos, rel_tol=1e-9, abs_tol=5.01e-7)
        assert math.isclose(g["lift"], lift, rel_tol=1e-9, abs_tol=5.01e-7)
        assert g["lift"] >= 1.0 or g["co_orders"] >= MIN_CO


def test_triangles_match_python(spark):
    from dump1090_stream_parser_spark.operators.basket import q_triangles

    row = q_triangles(spark, SF_DIR).collect()[0]

    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    co: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        ordered = sorted(parts)
        for i, u in enumerate(ordered):
            for v in ordered[i + 1:]:
                co[(u, v)] += 1
    edges = {pair for pair, c in co.items() if c >= MIN_CO}
    assert row["n_edges"] == len(edges)

    deg: dict[int, int] = defaultdict(int)
    adj: dict[int, set] = defaultdict(set)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        adj[u].add(v)
    assert row["n_nodes"] == len(deg)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_wedges"] == wedges

    tri = 0
    for a, b in edges:
        # ordered 3-clique: successors of both endpoints
        tri += len(adj[a] & adj[b])
    assert row["n_triangles"] == tri
    if wedges:
        assert abs(row["gcc"] - 3 * tri / wedges) < 5.01e-7
        assert 0.0 <= row["gcc"] <= 1.0


def test_triangle_census_orientation_independent(spark):
    """Any acyclic orientation counts each triangle exactly once: the
    id-ordered and degree-ordered censuses must be row-identical (the
    argument that lets the degree comparator promote into the
    registered plan without touching the oracle)."""
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.operators.basket import (
        MIN_CO,
        triangle_census,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= MIN_CO)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    by_id = triangle_census(edges, orient="id").collect()
    by_deg = triangle_census(edges, orient="degree").collect()
    assert [tuple(r) for r in by_id] == [tuple(r) for r in by_deg]
    # the degree orientation really is acyclic over (d, node): every
    # oriented edge ascends in that order
    oriented = triangle_census(
        edges, orient="degree", _oriented_only=True
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    checked = (
        oriented.join(
            deg.withColumnsRenamed({"node": "u", "d": "du"}), "u"
        )
        .join(deg.withColumnsRenamed({"node": "v", "d": "dv"}), "v")
        .filter(
            (F.col("du") > F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") > F.col("v")))
        )
        .count()
    )
    assert checked == 0
