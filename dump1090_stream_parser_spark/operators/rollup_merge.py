"""Tier C extension: incremental rollup maintenance (SURVEY.md §2
"hypertable rollup" north star -- the continuous-aggregate pattern: a
standing hourly rollup table is kept current by merging DELTA partial
rollups, never by rescanning history).

The operator IS the correctness proof of that pattern: the query
splits the event stream into two disjoint halves (event_id parity --
deterministic, engine-free, and adversarial in that every bucket
receives rows from BOTH halves), rolls each half up independently,
and MERGES the partial rollups by re-aggregation. The DuckDB oracle
computes the direct rollup over the unsplit stream. A value-hash match
therefore certifies the merge identity

    rollup(A) ++ rollup(B) == rollup(A ∪ B)

cross-engine on real data -- the property every incremental
maintenance job silently relies on. All measures are mergeable by
construction (counts and exact cent sums; averages ship as sum+count
and divide at read time, never stored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

def _measures() -> list:
    """The partial-rollup measure set: every column here must be a
    monoid (merge = SUM) for the delta-maintenance pattern to be
    sound. (Built per call -- Column construction needs a live
    SparkContext, which import time does not have.)"""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
        F.sum(F.col("user_id").isNotNull().cast("long")).alias(
            "n_with_user"
        ),
    ]


def _partial_rollup(events: DataFrame) -> DataFrame:
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "event_type",
    ).agg(*_measures())


@query(
    "q_rollup_merge",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_user
    FROM events
    GROUP BY 1, 2
    """,
)
def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type rollup maintained INCREMENTALLY: two
    disjoint halves of the stream are rolled up independently and the
    partial rollups merged by re-aggregation, while the oracle rolls
    up the unsplit stream directly -- so the driver's value hash
    certifies rollup(A) ++ rollup(B) == rollup(A ∪ B) cross-engine,
    the identity continuous-aggregate maintenance rests on.

    The split axis is event_id parity: deterministic, and worst-case
    for the merge in that every (bucket, type) cell receives rows from
    both halves (a time split would make merging trivial appends).
    Measures are monoids only -- counts and exact cent sums -- which is
    the design rule the module docstring states: a stored average or
    percentile would break the identity, so ratio measures ship as
    (sum, count) pairs.

    Scale shape: this is Spark's own partial+final aggregation made
    visible at the table level. In production the base rollup is an
    at-rest table partitioned by bucket; a new delta (late data, the
    next hour, a backfill) is one SMALL aggregation over the new rows
    plus a merge re-aggregation that touches only the buckets the
    delta contains -- history is never rescanned, and late data needs
    no special path because merge is order-free. The streaming
    twin is the hourly_message_rates tumbling aggregate, whose state
    rows are exactly these partial cells.
    """
    events = load_table(spark, sf_dir, "events")
    base = _partial_rollup(events.filter(F.expr("event_id % 2 = 0")))
    delta = _partial_rollup(events.filter(F.expr("event_id % 2 = 1")))
    return (
        base.unionAll(delta)
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
            F.sum("n_with_user").alias("n_with_user"),
        )
    )
