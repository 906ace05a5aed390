"""q_pagerank: fixed-point integer PageRank.

Beyond the registry parity gate (Spark vs DuckDB on the identical
integer recurrence), these legs pin the SEMANTICS:

1. third engine: a float-arithmetic numpy PageRank over the same graph
   agrees with the fixed-point ranks to within the documented floor
   bounds (the recurrences are the same math, not just the same code);
2. mass conservation: total rank mass is SCALE minus only the floor
   losses, with the loss bounded as the docstring claims;
3. structure: suppliers are 15:1 hubs of the bipartite trade graph and
   must dominate the mean rank.
"""

from __future__ import annotations

import numpy as np

from dump1090_stream_parser_spark.operators.graph import (
    PR_ITERS,
    PR_SCALE,
    q_pagerank,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _graph(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = {
        (r.o_custkey, r.l_suppkey)
        for r in orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).collect()
    }
    edges = [(c, -s) for c, s in pairs] + [(-s, c) for c, s in pairs]
    return edges


def test_pagerank_matches_float_reference(spark):
    edges = _graph(spark)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(PR_ITERS):
        nxt = np.full(n, 0.15 / n)
        contrib = r / outdeg
        for s, d in edges:
            nxt[idx[d]] += 0.85 * contrib[idx[s]]
        r = nxt

    got = {
        row.node_id: row.rank_scaled
        for row in q_pagerank(spark, SF_DIR).collect()
    }
    assert set(got) == set(nodes)
    # floor losses: <= 1 unit per edge contribution plus <= 2 units per
    # node per iteration, compounding over PR_ITERS -- loose but real
    tol_units = PR_ITERS * (len(edges) + 2 * n)
    for node in nodes:
        exact = r[idx[node]] * PR_SCALE
        assert abs(got[node] - exact) <= tol_units, (
            node,
            got[node],
            exact,
        )


def test_pagerank_mass_conservation(spark):
    rows = q_pagerank(spark, SF_DIR).collect()
    edges = _graph(spark)
    n = len(rows)
    mass = sum(r.rank_scaled for r in rows)
    loss = PR_SCALE - mass
    assert 0 <= loss <= PR_ITERS * (len(edges) + 2 * n), loss


def test_pagerank_suppliers_are_hubs(spark):
    rows = q_pagerank(spark, SF_DIR).collect()
    sup = [r.rank_scaled for r in rows if r.node_type == "supplier"]
    cus = [r.rank_scaled for r in rows if r.node_type == "customer"]
    assert sup and cus
    assert (sum(sup) / len(sup)) > 3 * (sum(cus) / len(cus))


def test_pagerank_plan_reuses_edges_not_rederives(spark):
    """The edge list is lazily checkpointed: the executed plan must not
    contain PR_ITERS copies of the orders-lineitem join."""
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    plan = formatted_plan(q_pagerank(spark, SF_DIR))
    assert plan.count("l_orderkey") <= 2, plan.count("l_orderkey")
