"""Tier C extension: event-sequence transition analytics (SURVEY.md §2
north-star adjacency -- the Markov transition matrix is the
user-journey primitive behind funnel design, churn screens, and
synthetic-sequence validation of a training-data event corpus: "does
the generated stream transition like the real one").

The operator is two aggregations over one ordered-window pass: lag()
pairs each event with its predecessor inside the user's own timeline,
pair counts hash-aggregate, and row-normalized probabilities are a
shared closed form over exact integer counts. Everything after the
window is domain-sized (|event_type|^2 cells).

Reference parity note: the reference script has no sequence operator
(its analytics stop at SQLite GROUP BY views); this module is part of
the mandated training-data extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from .registry import query

#: Row-normalized transition probability over exact integer counts --
#: one shared IEEE division so both engines emit bit-identical doubles.
_P = "CAST(n_trans AS DOUBLE) / CAST(row_total AS DOUBLE)"


@query(
    "q_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    r AS (
      SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS row_total
      FROM c GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, c.n_trans, r.row_total,
           ROUND({_P}, 6) AS p
    FROM c JOIN r ON r.prev_type = c.prev_type
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: for every (prev_type, next_type) pair, the transition
    count and the row-normalized probability P(next | prev).

    One user-keyed window pass (ts, event_id order -- event_id is the
    unique tiebreaker, so the pairing is total and engine-independent)
    emits each event's predecessor type; transitions then collapse in
    a hash aggregation with map-side partials. Row totals are a SECOND
    aggregation over the |types|^2 count cells -- never a second
    corpus pass -- broadcast-joined back, and the probability is one
    shared IEEE division over exact integers so the round(6) doubles
    hash-compare (q_mutual_info's cells discipline applied to ordered
    pairs).

    Scale: the only data-proportional exchange is the per-user window
    sort, and the pairing is SEGMENTABLE with a 1-row carry between
    contiguous time segments (q_acf's argument at lag 1), so a 100 TB
    stream never needs one task per user; everything downstream is
    domain-sized. The streaming twin (streaming/transitions.py) keeps
    exactly (last type, watermark) per key -- O(1) state -- and emits
    mergeable count DELTAS whose sum equals this matrix row-for-row
    under ordered replay (pytest e2e incl. checkpoint restart).

    tests/test_sequence.py recomputes the matrix in pure Python
    (third-engine check) and pins each row-distribution summing to 1.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    r = c.groupBy("prev_type").agg(F.sum("n_trans").alias("row_total"))
    return (
        c.join(F.broadcast(r), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            "row_total",
            F.round(F.expr(_P), 6).alias("p"),
        )
    )


# --------------------------------------------------------------------------
# Top event-type paths: the third-order extension of q_transitions --
# which 3-step journeys actually happen, ranked. The sequence-mining
# primitive behind funnel DESIGN (q_funnel/q_attribution measure a
# path you chose; this surfaces the paths worth measuring).
# --------------------------------------------------------------------------

#: Ranked paths to emit.
TOP_PATHS = 25

#: Path share over exact integer counts -- one shared IEEE division.
_PATH_SHARE = "CAST(n_paths AS DOUBLE) / CAST(total_paths AS DOUBLE)"


@query(
    "q_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 2) OVER w AS t1,
             lag(event_type, 1) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT t1, t2, event_type AS t3,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM seq WHERE t1 IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT CAST(SUM(n_paths) AS BIGINT) AS total_paths FROM paths
    )
    SELECT t1, t2, t3, n_paths,
           ROUND({_PATH_SHARE}, 6) AS share
    FROM paths CROSS JOIN tot
    ORDER BY n_paths DESC, t1, t2, t3
    LIMIT {TOP_PATHS}
    """,
)
def q_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_PATHS} 3-step event-type paths across all user
    timelines, with each path's count and share of all 3-step windows.

    ONE user-keyed window pass serves both lags (the q_acf
    all-lags-share-one-sort shape): lag(type, 2) and lag(type, 1) over
    the same (ts, event_id) order -- event_id makes the pairing total
    -- then sliding 3-windows hash-aggregate to at most |types|^3
    cells with map-side partials. The share denominator is a SECOND
    aggregation over those domain-sized cells (never a corpus pass),
    delivered by a 1-row broadcast; the cut is
    TakeOrderedAndProject with exact-integer ordering and the full
    (t1, t2, t3) lexicographic tiebreak, so both engines select
    identical rows.

    Scale: identical posture to q_transitions -- the window sort is
    the only data-proportional exchange, segmentable with a 2-row
    carry (q_acf's argument at lag 2); everything downstream is
    domain-sized. Higher orders swap the lag count; suffix paths
    (prefix-closed mining a la PrefixSpan) iterate this shape per
    length with the count floor pruning the frontier.

    tests/test_sequence.py recomputes the ranked paths in pure Python
    (third-engine check) and pins shares summing to 1 over the full
    (untruncated) path table.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
    )
    paths = (
        seq.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    tot = paths.agg(F.sum("n_paths").alias("total_paths"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(TOP_PATHS)
        .select(
            "t1",
            "t2",
            "t3",
            "n_paths",
            F.round(F.expr(_PATH_SHARE), 6).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Longest activity streak: consecutive-day engagement runs per user --
# the retention/habit metric (and the date-grain gaps-and-islands
# shape, complementing q_dup_spans' position-grain islands).
# --------------------------------------------------------------------------

#: Ranked users to emit.
TOP_STREAKS = 20


@query(
    "q_streaks",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d
             ) AS INTEGER) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS streak_start
      FROM isl GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id,
             MAX(len) AS best_streak,
             CAST(COUNT(*) AS BIGINT) AS n_streaks,
             CAST(SUM(len) AS BIGINT) AS active_days
      FROM streaks GROUP BY 1
    ),
    first_best AS (
      SELECT b.user_id, b.best_streak, b.n_streaks, b.active_days,
             MIN(s.streak_start) AS best_start
      FROM best b JOIN streaks s
        ON s.user_id = b.user_id AND s.len = b.best_streak
      GROUP BY 1, 2, 3, 4
    )
    SELECT user_id, best_streak, n_streaks, active_days,
           CAST(best_start AS TIMESTAMP) AS best_start
    FROM first_best
    ORDER BY best_streak DESC, user_id
    LIMIT {TOP_STREAKS}
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_STREAKS} users by longest consecutive-day activity
    streak, with their streak count, total active days, and the first
    day of the (earliest) best streak.

    Date-grain gaps-and-islands: DISTINCT (user, day) collapses the
    stream to the activity calendar (one mergeable exchange -- the
    corpus-proportional step), then day minus per-user rank is
    constant exactly within a consecutive run, so one user-keyed
    window pass + two domain-sized aggregations produce every streak.
    All comparisons are date/integer arithmetic -- nothing to round,
    both engines select identical rows under the (best_streak DESC,
    user_id) total order.

    Scale: the window partitions on user_id over DISTINCT DAYS (at
    most days-per-year rows per user-year regardless of event volume
    -- the DISTINCT is the bound, same discipline as
    q_weighted_median's value collapse); streak aggregation is
    ordinary hash agg with map-side partials. The same shape computes
    session streaks, delivery streaks, or training-shard continuity
    by swapping the day expression.

    tests/test_sequence.py recomputes every user's streak profile in
    pure Python (third-engine check) and pins the identity
    active_days == sum of streak lengths <= distinct days.
    """
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    isl = days.withColumn(
        "grp",
        F.date_sub(
            "d",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("d")
            ),
        ),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("streak_start"),
    )
    best = streaks.groupBy("user_id").agg(
        F.max("len").alias("best_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )
    first_best = (
        best.join(
            streaks.select(
                "user_id",
                F.col("len").alias("best_streak"),
                "streak_start",
            ),
            ["user_id", "best_streak"],
        )
        .groupBy("user_id", "best_streak", "n_streaks", "active_days")
        .agg(F.min("streak_start").alias("best_start"))
    )
    return (
        first_best.orderBy(F.desc("best_streak"), "user_id")
        .limit(TOP_STREAKS)
        .select(
            "user_id",
            "best_streak",
            "n_streaks",
            "active_days",
            F.col("best_start").cast("timestamp").alias("best_start"),
        )
    )
