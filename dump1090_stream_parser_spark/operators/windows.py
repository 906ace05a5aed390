"""Tier B relational surface, part 3: window functions (SURVEY.md §2.2
"Window: ranking / analytic / aggregate+frame").

The reference workload these mirror: "latest position per aircraft"
(row_number over hex_ident ordered by parsed_time desc), altitude deltas
between consecutive messages (lag), running totals. All three share one
physical shape -- shuffle by partition key, sort within partition -- so at
scale the partition key choice (entity id) is what bounds skew; a single
hot aircraft is still one task's worth of rows.

Determinism: every ORDER BY includes a unique tiebreaker (orderkey /
event_id) so ranks and lags are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import scaled_int
from ..tables import load_table
from .registry import query


@query(
    "q_window_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o.*, row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders o
    ) t
    WHERE rn = 1
    """,
)
def q_window_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest state per entity' (SURVEY.md §2.2 "Window: ranking"): the
    newest order per customer, the squitters latest-position twin."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "q_window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS price_delta,
           lag(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_orderkey
    FROM orders
    """,
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytics (SURVEY.md §2.2 "Window: analytic"): delta vs previous
    order -- the altitude-delta-between-consecutive-squitters twin."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
            "price_delta"
        ),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@query(
    "q_window_running",
    oracle="""
    WITH o AS (
      SELECT orders.*,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           SUM(price_cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
             AS running_spend,
           CAST(SUM(price_cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
             AS moving_avg_3,
           rank() OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             AS spend_rank
    FROM o
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate windows with explicit frames + rank (SURVEY.md §2.2
    "Window: aggregate + frame"): running total, 3-row moving average.
    Both frames reuse the same shuffle+sort by (custkey, date)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_cents", scaled_int(F.col("o_totalprice"))
    )
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = ordered.rowsBetween(-2, Window.currentRow)
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum("price_cents").over(running) / 100.0).alias("running_spend"),
        (
            F.sum("price_cents").over(moving).cast("double")
            / F.count("*").over(moving)
            / 100.0
        ).alias("moving_avg_3"),
        F.rank().over(by_price).alias("spend_rank"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           dense_rank() OVER nw AS balance_drank,
           ntile(4) OVER nw AS balance_quartile,
           percent_rank() OVER nw AS balance_prank,
           cume_dist() OVER nw AS balance_cume
    FROM customer
    WINDOW nw AS (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows (SURVEY.md §2.2 "Window: ranking"):
    dense_rank / ntile / percent_rank / cume_dist share one window spec,
    so Catalyst plans a single shuffle+sort for all four."""
    cust = load_table(spark, sf_dir, "customer")
    nw = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(nw).alias("balance_drank"),
        F.ntile(4).over(nw).alias("balance_quartile"),
        # raw doubles, never rounded: (rank-1)/(n-1) and k/n are single
        # IEEE divisions, bit-identical across engines; rounding at a
        # boundary half (e.g. 41/640) is where engines disagree
        F.percent_rank().over(nw).alias("balance_prank"),
        F.cume_dist().over(nw).alias("balance_cume"),
    )


# --------------------------------------------------------------------------
# Ordered funnel analysis over the events stream stand-in (window
# capability applied to the product-analytics shape every event pipeline
# needs). Strict ordered-subsequence semantics on first occurrences with
# a per-stage conversion deadline: stage N counts users with an event of
# type N inside (t_{N-1}, t_{N-1} + deadline]. Timestamps are exact
# microseconds in both engines, so the deadline comparison has no float
# boundary. Three stacked conditional window-mins share ONE partitioning
# (user_id), so the whole funnel is a single exchange followed by a
# per-user rollup that reuses the same partitioning.
# --------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")
#: Mirrored literally in the oracle SQL above -- keep in sync.
FUNNEL_DEADLINE_HOURS = 24


@query(
    "q_funnel",
    oracle="""
    WITH w1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
                          AND ts <= t1 + INTERVAL 24 HOUR
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                          AND ts <= t2 + INTERVAL 24 HOUR
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    ),
    per_user AS (
      SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      FROM w3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t1) AS n_view,
           COUNT(t2) AS n_click_after_view,
           COUNT(t3) AS n_purchase_after_click
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage ordered funnel (view -> click -> purchase) on first
    occurrences. Stage times are stacked conditional MIN windows over
    the same user_id partitioning -- one shuffle for all three stages,
    and the per-user rollup reuses that partitioning (no second
    exchange). At 100 TB the funnel cost is one events-sized shuffle."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "t1",
            F.min(
                F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STAGES[1])
                    & (F.col("ts") > F.col("t1"))
                    & (
                        F.col("ts")
                        <= F.col("t1")
                        + F.expr(f"INTERVAL {FUNNEL_DEADLINE_HOURS} HOURS")
                    ),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STAGES[2])
                    & (F.col("ts") > F.col("t2"))
                    & (
                        F.col("ts")
                        <= F.col("t2")
                        + F.expr(f"INTERVAL {FUNNEL_DEADLINE_HOURS} HOURS")
                    ),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click_after_view"),
        F.count("t3").alias("n_purchase_after_click"),
    )


@query(
    "q_window_trailing",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(1) OVER w AS BIGINT) AS n_trailing_1h,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
             AS trailing_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (SURVEY.md §2.2 "Window: aggregate +
    frame"): per-user trailing-1-hour event count and value sum -- the
    sliding-metric shape (rate limiting, rolling spend) that
    rowsBetween cannot express when events are irregularly spaced.
    Spark's rangeBetween needs a numeric ordering column, so both
    engines order by exact epoch MICROseconds with a 3.6e9-us lower
    bound -- identical to INTERVAL 1 HOUR with no truncation (ordering
    by unix_timestamp seconds would silently widen the frame for rows
    a fraction of a second past the hour). One shuffle on user_id
    serves both window aggregates; values are exact integer cents so
    the trailing sums hash identically."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(cast(ts as timestamp))"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .over(w)
        .alias("trailing_cents"),
    )


@query(
    "q_scd2_intervals",
    oracle="""
    WITH chg AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    v AS (
      SELECT user_id, event_type, ts AS valid_from, event_id,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS version
      FROM chg WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, valid_from, valid_to,
           CAST(version AS BIGINT) AS version,
           valid_to IS NULL AS is_current
    FROM v
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: turn
    each user's event_type history into versioned validity intervals
    -- change detection via lag() (a row opens a version iff it
    differs from the previous state), interval close via lead() over
    the change rows (half-open [valid_from, valid_to); NULL = current,
    flagged is_current), version = per-user ordinal. The warehouse op
    that turns mutation streams into as-of-queryable dimension
    history; the engine's as-of join / LOCF tier then reads these
    intervals directly.

    Scale: two window passes over the same user_id partitioning --
    Catalyst plans ONE exchange + sort serving both (the change
    filter preserves partitioning and order), so the corpus shuffles
    once, keyed by the dimension's natural key. No frame carries
    unbounded state (lag/lead are 1-row). Skew = hot entities, the
    standard dimension-key caveat (salt or split hot keys upstream).
    Ordering ties break on event_id in BOTH engines so the intervals
    are deterministic even if one entity mutates twice in one tick."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
