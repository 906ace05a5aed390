"""Tier C extension: conversion attribution (SURVEY.md §2 north-star
"pipeline funnel" adjacency -- q_funnel asks whether a user progressed
through stages; attribution asks which touchpoint gets CREDIT for each
individual conversion, the report a mixture-curation or campaign
dashboard actually bills against).

Last-touch with a lookback window: every purchase is credited to the
latest preceding click/view by the same user within 7 days, else to
the explicit ``unattributed`` bucket. The matching rule is an AS-OF
join, executed in the house one-exchange form: tag touches and
conversions, ONE window over (user_id, ordered by ts then event_id)
carries the latest-touch struct via a max over the
UNBOUNDED-PRECEDING..1-PRECEDING frame (struct ordering is
lexicographic (us, event_id, ...) in both engines, so "latest" is
deterministic including same-timestamp ties), and the lookback check
is plain integer microsecond arithmetic afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from .registry import query

#: Lookback window: a touch older than this gets no credit.
LOOKBACK_US = 7 * 24 * 3600 * 1_000_000

TOUCH_TYPES = ("view", "click")
CONVERSION_TYPE = "purchase"


@query(
    "q_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE user_id IS NOT NULL
        AND event_type IN ('view', 'click', 'purchase')
    ),
    t AS (
      SELECT *,
             max(CASE WHEN event_type <> 'purchase' THEN
                   {{'us': us, 'event_id': event_id,
                     'channel': event_type}} END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS touch
      FROM e
    ),
    c AS (
      SELECT CASE WHEN touch IS NOT NULL
                   AND touch.us >= us - {LOOKBACK_US}
                  THEN touch.channel ELSE 'unattributed' END AS channel,
             CASE WHEN touch IS NOT NULL
                   AND touch.us >= us - {LOOKBACK_US}
                  THEN us - touch.us END AS lag_us,
             cents
      FROM t WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS value_cents,
           CAST(SUM(lag_us) AS BIGINT) AS total_lag_us
    FROM c GROUP BY channel
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution with a 7-day lookback: every
    purchase credits the latest preceding view/click by the same user
    (ties at the same timestamp broken by event_id -- the struct
    ordering), purchases with no in-window touch land in the explicit
    ``unattributed`` bucket. Per channel: conversions, exact
    cent-scaled value credit, and total touch-to-conversion lag in
    microseconds (exact integers end-to-end -- nothing in the output
    is a float, so the report hash-compares with no rounding clause).

    Physical shape is the one-exchange as-of: no join at all -- touches
    and conversions ride the SAME user-keyed window sort, and the
    latest-touch struct propagates through a max over the
    rows(-unbounded, -1) frame, which both engines order
    lexicographically by (us, event_id). The lookback and lag are
    integer microsecond arithmetic after the window. At 100 TB the
    cost is one events-sized shuffle on user_id -- identical to
    q_funnel's, and strictly cheaper than the conversions-join-touches
    formulation, which shuffles the same rows TWICE and re-sorts the
    touch side per conversion (the q_asof_lastval union precedent,
    extended with per-row credit rather than last-value fill).

    Streaming twin guidance: the window state is one (us, event_id,
    channel) triple per user -- the same O(1)-per-key regime as
    streaming/ema.py; a touch updates it, a conversion reads it.
    """
    events = load_table(spark, sf_dir, "events")
    e = events.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin(*TOUCH_TYPES, CONVERSION_TYPE)
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.max(
        F.when(
            F.col("event_type") != CONVERSION_TYPE,
            F.struct(
                F.col("us").alias("us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("channel"),
            ),
        )
    ).over(w)
    t = e.withColumn("touch", touch).filter(
        F.col("event_type") == CONVERSION_TYPE
    )
    in_window = F.col("touch").isNotNull() & (
        F.col("touch.us") >= F.col("us") - F.lit(LOOKBACK_US)
    )
    c = t.select(
        F.when(in_window, F.col("touch.channel"))
        .otherwise(F.lit("unattributed"))
        .alias("channel"),
        F.when(in_window, F.col("us") - F.col("touch.us")).alias(
            "lag_us"
        ),
        "cents",
    )
    return c.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("cents").alias("value_cents"),
        F.sum("lag_us").alias("total_lag_us"),
    )
