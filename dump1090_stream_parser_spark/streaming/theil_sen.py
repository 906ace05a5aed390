"""Streaming Theil-Sen: a standing robust daily-volume trend per event
type -- the streaming twin of ``operators.statistics.q_theil_sen`` and
the drift companion to streaming/burst.py: burst flags TODAY's
anomaly, this tracks the robust multi-week TREND the anomaly is judged
against.

The median-of-pairwise-slopes needs only the (type, day, count)
collapse, and daily counts are incremental integers, so state is one
count per (type, day) key -- the stateful stage shards across the
day grid (horizon-bounded forever: a year is 365 state rows per
type). The trend itself is NOT recomputed in Python:
``theil_sen_from_state`` hands the max-ver day snapshots to the batch
operator's ``theil_sen_from_daily`` -- the IDENTICAL Spark pair/rank
expressions -- so stream output bit-equals batch output on the same
rows BY CONSTRUCTION (the streaming/subsample.py discipline).
``tests/test_theil_sen_stream.py`` pins that equality across a 2-file
split and state carry across a checkpoint restart.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.statistics import theil_sen_from_daily

_STATE_SCHEMA = "y long, ver long"

TS_OUTPUT_SCHEMA = "event_type string, x long, y long, ver long"


def _fold(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        y, ver = state.get
    else:
        y, ver = 0, 0
    for pdf in batches:
        y += int(len(pdf))
    ver += 1
    state.update((y, ver))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "x": [key[1]],
            "y": [y],
            "ver": [ver],
        }
    )


def theil_sen_stream(stream: DataFrame) -> DataFrame:
    """Standing (type, day, count) collapse over an events-shaped
    stream: one state row per (type, day)."""
    keyed = stream.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .cast("long")
        .alias("x"),
    )
    return keyed.groupBy("event_type", "x").applyInPandasWithState(
        _fold,
        outputStructType=TS_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def theil_sen_from_state(raw: DataFrame) -> DataFrame:
    """Current trend table: max-ver day counts through the batch
    operator's theil_sen_from_daily."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type", "x").orderBy(F.desc("ver"))
    latest = (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "x", "y")
    )
    return theil_sen_from_daily(latest)
