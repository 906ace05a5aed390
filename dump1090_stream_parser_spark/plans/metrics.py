"""Executed-plan metric extraction: measured shuffle/broadcast volume.

Wall-clock at local[32] understates exchange costs -- an in-memory
shuffle of a few million 8-byte rows is nearly free locally, while on a
1000-executor cluster the same exchange is network + spill and often IS
the job. These helpers read the ACTUAL SQLMetrics off the executed
(AQE-final) plan after an action, so scale arguments ("variant A moves
10x fewer bytes through the exchange") can be measured, not asserted.

Used by tools/scale_probe.py's contamination-fork probe and available
for any plan-volume comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _metric_map(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _children(node):
    kids = []
    ch = node.children()
    for i in range(ch.size()):
        kids.append(ch.apply(i))
    if not kids:
        # AQE wrappers (AdaptiveSparkPlan, *QueryStage) hide their
        # subtree behind executedPlan()/plan() instead of children()
        for meth in ("executedPlan", "plan"):
            if hasattr(node, meth):
                try:
                    kids.append(getattr(node, meth)())
                    break
                except Exception:  # noqa: BLE001 -- not that wrapper
                    continue
    return kids


def exchange_totals(df: DataFrame) -> dict[str, int]:
    """Run ``df`` (collect) and total its exchange metrics.

    Returns shuffle_records / shuffle_bytes summed over every shuffle
    Exchange in the AQE-final plan, broadcast_bytes over every
    BroadcastExchange, and the node counts. ``Reused*`` nodes are
    skipped entirely (their work was counted at the original node)."""
    df.collect()
    totals = {
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "broadcast_bytes": 0,
        "n_shuffles": 0,
        "n_broadcasts": 0,
    }

    def walk(node):
        name = node.nodeName()
        if name.startswith("Reused"):
            return
        if name == "Exchange":
            m = _metric_map(node)
            totals["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
            totals["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
            totals["n_shuffles"] += 1
        elif name == "BroadcastExchange":
            m = _metric_map(node)
            totals["broadcast_bytes"] += m.get("dataSize", 0)
            totals["n_broadcasts"] += 1
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().executedPlan())
    return totals
