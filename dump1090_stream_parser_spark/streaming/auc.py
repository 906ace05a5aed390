"""Streaming AUC: a standing ROC AUC over an unbounded scored-document
stream -- the streaming twin of ``operators.inference.q_auc`` and the
online model gate: "is the ranking still good on today's traffic",
updated per micro-batch.

The rank-sum identity needs only the (distinct score, positive-count,
negative-count) collapse, and counts are incremental, so state is one
(cp, cn) integer pair per distinct score -- keyed BY score, which
shards the stateful stage across the score grid instead of one
monolith. State size rides the distinct-score grid: bounded for
quantized/rounded scores (the q_auc docstring's fixed-grain remedy is
the production dial for continuous models; this corpus's feature grid
is finite by construction).

The AUC itself is NOT recomputed in Python: ``auc_from_state`` hands
the max-ver snapshots to the batch operator's ``auc_tail`` -- the
IDENTICAL Spark expressions (CDF window, decimal(38,0) u2 sum, shared
closed form) -- so stream output bit-equals batch output on the same
rows BY CONSTRUCTION (the streaming/subsample.py discipline).
``tests/test_auc_stream.py`` pins that equality across a 2-file split
and state carry across a checkpoint restart.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.inference import auc_tail, model_score_expr

_STATE_SCHEMA = "cp long, cn long, ver long"

AUC_OUTPUT_SCHEMA = "score double, cp long, cn long, ver long"


def _fold(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cp, cn, ver = state.get
    else:
        cp, cn, ver = 0, 0, 0
    for pdf in batches:
        pos = pdf["pos"].to_numpy()
        cp += int((pos == 1).sum())
        cn += int((pos == 0).sum())
    ver += 1
    state.update((cp, cn, ver))
    yield pd.DataFrame(
        {"score": [key[0]], "cp": [cp], "cn": [cn], "ver": [ver]}
    )


def auc_stream(stream: DataFrame, score_grain: int | None = None) -> DataFrame:
    """Standing (score, cp, cn) collapse over a documents-shaped
    stream: scores via model_score_expr -- the JVM expression twin of
    the Arrow forward pass (identical IEEE op sequence, so the score
    doubles match the batch path bit-for-bit without a stream-stream
    join) -- one state row per distinct score.

    ``score_grain`` (ADVICE r10): state cardinality is the distinct-
    score grid, and a continuous production score domain would grow it
    without bound under GroupStateTimeout.NoTimeout. Pass a decimal
    grain (e.g. 4) to round scores before the stateful groupBy, capping
    state at 10^grain * range rows -- the q_auc docstring's fixed-grain
    remedy, available in the stream path instead of only documented.
    None (the default) keeps exact scores: bit-equality with the batch
    q_auc holds only ungrained, so the tests and this corpus's finite
    feature grid use None."""
    score = model_score_expr()
    if score_grain is not None:
        score = F.round(score, score_grain)
    t = stream.select(
        score.alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    return t.groupBy("score").applyInPandasWithState(
        _fold,
        outputStructType=AUC_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def auc_from_state(raw: DataFrame) -> DataFrame:
    """Current AUC from the append-mode output: max-ver snapshot per
    score through the batch operator's auc_tail."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("score").orderBy(F.desc("ver"))
    latest = (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("score", "cp", "cn")
    )
    return auc_tail(latest)
