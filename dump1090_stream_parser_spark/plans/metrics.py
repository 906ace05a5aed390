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
    skipped entirely (their work was counted at the original node).

    CAVEAT: this reads the final plan TREE, so work AQE surgically
    removed after executing it is invisible -- e.g. a join branch that
    turned out empty (AQEPropagateEmptyRelation rewrites the join away,
    leaving its already-materialized stages unreachable) or a subtree
    behind a localCheckpoint. For run-level accounting that survives
    those rewrites, use :func:`stage_shuffle_snapshot` /
    :func:`stage_shuffle_delta` (REST status store: every executed
    stage counts, reachable from the final plan or not)."""
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


def stage_shuffle_snapshot(spark) -> dict[int, tuple[int, int]]:
    """Per-stage (shuffle write records, bytes) from the UI status
    store, keyed by stageId -- a cumulative snapshot. Diff two
    snapshots around a run with :func:`stage_shuffle_delta` to get that
    run's TOTAL exchange volume, robust to AQE plan surgery (empty-
    relation join elimination, reuse, checkpoint lineage cuts) that
    makes the final plan tree under-report."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url) as resp:
        stages = _json.load(resp)
    return {
        s["stageId"]: (
            s.get("shuffleWriteRecords", 0),
            s.get("shuffleWriteBytes", 0),
        )
        for s in stages
    }


def stage_shuffle_delta(
    before: dict[int, tuple[int, int]],
    after: dict[int, tuple[int, int]],
) -> dict[str, int]:
    """Total shuffle volume of the stages that completed between two
    :func:`stage_shuffle_snapshot` calls."""
    new = set(after) - set(before)
    return {
        "shuffle_records": sum(after[s][0] for s in new),
        "shuffle_bytes": sum(after[s][1] for s in new),
        "n_stages": len(new),
    }
