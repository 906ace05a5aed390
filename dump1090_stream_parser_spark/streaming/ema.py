"""Streaming EMA: a standing per-key exponentially weighted average --
the streaming twin of ``operators.timeseries.q_ema``.

State is O(1) per key BY CONSTRUCTION: the fold accumulator itself
(one double) plus the observation count. Unlike the sketch twins
(count-min, KMV) the EMA fold is NOT commutative, so the twin's
contract is ORDERED ARRIVAL: rows are folded in (ts, event_id) order
within each micro-batch, and micro-batch boundaries may split but
never reorder a key's sequence (file-replay and log sources that
preserve per-key order satisfy this; out-of-order sources need an
upstream watermark/reorder stage, the streaming as-of precedent).
Under that contract the stream fold executes the EXACT op sequence of
the batch sorted-array fold -- seed with the first value, then
``acc*0.75 + 0.25*x`` per row, all IEEE doubles -- so the emitted
values are bit-identical to the batch query's regardless of where
micro-batches cut (pinned in tests/test_ema_stream.py, including
across a checkpoint restart).

Output is append-mode rows stamped with a monotonically-increasing
``ver``; the current table is the max-``ver`` row per key
(:func:`latest_ema`). Rounding happens only at emission, with the
shortest-repr HALF_UP quantize that matches Spark's round() (the
weighted-sample discipline), so the latest row hash-compares with the
batch q_ema row for the same prefix.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import EMA_ALPHA

_STATE_SCHEMA = "ema double, n long, ver long"

EMA_OUTPUT_SCHEMA = (
    "user_id long, n_events long, ema_value double, ver long"
)


def _round6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )
    )


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # pragma: no cover - NoTimeout below
        state.remove()
        return

    if state.exists:
        ema, n, ver = state.get
        n = int(n)
        ver = int(ver)
    else:
        ema, n, ver = None, 0, 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows[rows["value"].notna()]
    if not len(rows):
        return
    rows = rows.sort_values(["ts", "event_id"])
    one_minus = 1.0 - EMA_ALPHA
    for x in rows["value"]:
        x = float(x)
        # the batch fold's exact op sequence: NULL-seed, then one
        # multiply-add chain per row (no FMA on either engine)
        ema = x if ema is None else ema * one_minus + EMA_ALPHA * x
    n += len(rows)
    ver += 1
    state.update((float(ema), n, ver))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "ema_value": [_round6(float(ema))],
            "ver": [ver],
        }
    )


def ema_stream(event_stream: DataFrame) -> DataFrame:
    """Running per-user EMA over a stream of (user_id, ts, event_id,
    value) rows. Emits one row per (key, micro-batch that touched it);
    the current table is :func:`latest_ema` over the sink."""
    return (
        event_stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_ema(rows: DataFrame) -> DataFrame:
    """Batch helper over an emitted-rows sink: each key's max-``ver``
    emission, shaped like q_ema's output."""
    latest = rows.groupBy("user_id").agg(F.max("ver").alias("ver"))
    return rows.join(latest, ["user_id", "ver"]).select(
        "user_id", "n_events", "ema_value"
    )
