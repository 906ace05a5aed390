"""Streaming compaction planner: a standing small-file bin-packing
plan over a growing table -- the streaming twin of
``operators.pipeline_ops.q_compaction_plan``. An ingest pipeline's
fragment inventory changes with every micro-batch; re-planning from
scratch is a full metadata scan, but fragment SIZES are incremental
integers, so a standing stream keeps per-fragment counts as state
(one long per (partition, fragment) key -- metadata-sized forever)
and the current plan is the batch packing stages evaluated over the
state snapshot.

The plan itself is NOT recomputed in Python: ``plan_from_state``
hands max-ver fragment sizes to the batch operator's
``compaction_plan_from_inventory`` -- the IDENTICAL window
expressions -- so the streaming plan bit-equals the batch plan on
the same rows BY CONSTRUCTION. ``tests/test_compaction_stream.py``
pins that equality across a 2-file split and state carry across a
checkpoint restart.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.pipeline_ops import compaction_plan_from_inventory

_STATE_SCHEMA = "size_rows long, ver long"

COMPACT_OUTPUT_SCHEMA = (
    "d timestamp, hr int, size_rows long, ver long"
)


def _fold(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        size, ver = state.get
    else:
        size, ver = 0, 0
    for pdf in batches:
        size += int(len(pdf))
    ver += 1
    state.update((size, ver))
    yield pd.DataFrame(
        {
            "d": [key[0]],
            "hr": [key[1]],
            "size_rows": [size],
            "ver": [ver],
        }
    )


def compaction_stream(stream: DataFrame) -> DataFrame:
    """Standing fragment inventory over an events-shaped stream: one
    state row per (day, hour) fragment."""
    keyed = stream.select(
        F.date_trunc("day", "ts").alias("d"),
        F.hour("ts").alias("hr"),
    )
    return keyed.groupBy("d", "hr").applyInPandasWithState(
        _fold,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def plan_from_state(raw: DataFrame) -> DataFrame:
    """Current compaction plan: max-ver fragment sizes through the
    batch operator's packing stages."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("d", "hr").orderBy(F.desc("ver"))
    latest = (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("d", "hr", "size_rows")
    )
    return compaction_plan_from_inventory(latest)
