"""Tier C extension: time-series recurrences (SURVEY.md §2 north-star
"operations a large-scale training-data pipeline would need" -- smoothed
per-entity metrics feed quality dashboards and drift monitors the same
way the reference's hourly message-rate query feeds its dump1090 view).

The headline operator is the exponentially weighted moving average: a
LINEAR RECURRENCE (ema_t = (1-a)*ema_{t-1} + a*x_t) that no built-in
Spark aggregate expresses -- window frames see raw rows, not folded
state. Two implementations share the module:

- :func:`q_ema` -- the parity shape: one hash shuffle on the entity key,
  then the house sorted-array fold (Spark ``aggregate`` over
  ``sort_array(collect_list(...))`` vs DuckDB ``list_reduce`` over
  ``list(... ORDER BY ...)``), both engines folding the identical
  ordered list left-to-right so the rounded doubles hash-compare.
  DuckDB's ``list_reduce`` seeds with the FIRST element -- exactly the
  EMA seeding ema_1 = x_1 -- and the Spark lambda replicates that seed
  with a NULL accumulator branch.
- :func:`ema_segmented` -- the 100 TB shape. Each observation is the
  affine map e -> (1-a)*e + a*x; affine maps compose associatively
  ((A2,B2)ยบ(A1,B1) = (A2*A1, A2*B1+B2)), so contiguous TIME SEGMENTS
  partial-aggregate independently and only segment summaries (two
  doubles each) ride the second shuffle. With ema_1 = x_1 seeding, the
  closed form is ema_n = A_total * x_first + B_total. A per-key series
  that is one task's worth of rows in q_ema becomes #segments
  bounded-size folds here; tests/test_timeseries.py pins segmented ==
  single-fold to float-reassociation tolerance.

Reference parity note: the reference script has no smoothing operator
(its analytics stop at SQLite GROUP BY views); this module is part of
the mandated training-data extension surface, not a port.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import keyed_spread, load_table, table_path
from .registry import query

#: Smoothing factor. 0.25 and 0.75 are exact in binary floating point,
#: so the per-step arithmetic is the same two IEEE ops in both engines
#: (one multiply-add chain, no decimal-literal conversion slack).
EMA_ALPHA = 0.25


@query(
    "q_ema",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> acc * 0.75 + 0.25 * x),
                 6) AS ema_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of ``value`` over
    the event stream, seeded with the first observation (ema_1 = x_1,
    ema_t = 0.75*ema_{t-1} + 0.25*x_t in (ts, event_id) order).

    The recurrence no built-in aggregate expresses: a window frame sums
    raw rows, but EMA needs the FOLDED accumulator at every step. Shape
    is the house sorted-array fold -- one hash shuffle on user_id
    collects (ts, event_id, value) structs, ``sort_array`` orders them
    bytewise-identically to the oracle's ``ORDER BY ts, event_id``
    (event_id is the unique tiebreaker), and ``F.aggregate`` folds
    left-to-right with a NULL-seed branch replicating DuckDB
    ``list_reduce``'s seed-with-first-element -- which IS the EMA
    seeding, so neither engine special-cases the head. Every step is
    acc*0.75 + 0.25*x on doubles (both constants exact in binary), so
    the fold is bit-identical cross-engine and only the final value is
    rounded to 6.

    Scale -- DENSITY-DISPATCHED since round 9 (VERDICT r8 ask #2): the
    single fold carries one task per user, and the round-8 crossover
    probe (docs/SCALE.md) measured where that breaks -- fine at 1,584
    rows/key (0.71 s at x16), 2.1x slower than the segmented plan at
    6,336 rows/key (4.16 s vs 1.95 s at x64). This registered query
    therefore PROBES the density first (one mergeable column-pruned
    max-count aggregation -- the dedup.py:858 scalar-probe precedent)
    and dispatches: single fold while every key's series fits a task
    (max rows/key <= EMA_SEGMENT_MAX_TASK_ROWS, the measured-crossover
    midpoint), :func:`ema_segmented` beyond -- the affine-composition
    identity (each observation is the map e -> 0.75e + 0.25x; maps
    compose associatively) partial-aggregates bounded time segments so
    only (A, B) double pairs ride the key-level shuffle. The segmented
    result is equal modulo float reassociation (pinned to tolerance in
    tests/test_timeseries.py); the oracle hash-certifies the single
    fold, which the probe guarantees is the executed plan at every
    driver SF. The Structured Streaming twin (streaming/ema.py) keeps
    the fold accumulator itself as O(1) state and is bit-identical to
    this query under ordered replay (tests/test_ema_stream.py, incl.
    restart).
    """
    if _series_exceeds_task_bound(spark, sf_dir):
        return ema_segmented(spark, sf_dir).select(
            "user_id",
            "n_events",
            F.round("ema_value", 6).alias("ema_value"),
        )
    return ema_single_fold(spark, sf_dir)


#: Dispatch threshold: the measured single-fold/segmented crossover
#: lands between 1,584 rows/key (single fold wins, 0.71 s vs 1.13 s)
#: and 6,336 rows/key (segmented wins, 1.95 s vs 4.16 s) -- the
#: docs/SCALE.md round-8 table. 4096 is the midpoint on the 2^k grid.
EMA_SEGMENT_MAX_TASK_ROWS = 4096

#: Memoized density-probe results, keyed on the events directory. The
#: probe is an eager full-table aggregation; without the cache every
#: plan-only consumer (plan snapshots, repeated bench reps, tooling
#: that just builds the DataFrame) paid a corpus scan per CALL of
#: q_ema/q_holt (r9 ADVICE). Test fixtures are read-only / unique-per-
#: test temp dirs, so a path-keyed cache cannot go stale in practice;
#: ``_probe_cache.clear()`` resets it if a fixture is ever rewritten
#: in place.
_probe_cache: dict[str, bool] = {}


def _series_exceeds_task_bound(spark: SparkSession, sf_dir: str) -> bool:
    """Shared q_ema/q_holt density probe: does any user's series exceed
    EMA_SEGMENT_MAX_TASK_ROWS (the measured single-fold/segmented
    crossover)? One mergeable column-pruned max-count aggregation (the
    dedup.py scalar-probe precedent), memoized per sf_dir.

    The dispatch decision is LOGGED when the segmented branch is taken
    (r9 ADVICE): past the crossover the registered query switches to a
    plan that is only tolerance-equal to the hash-certified oracle, so
    an oracle-hash failure must be immediately attributable to the
    plan switch rather than a regression.
    """
    cached = _probe_cache.get(sf_dir)
    if cached is not None:
        return cached
    events = load_table(spark, sf_dir, "events")
    longest = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .first()["m"]
    )
    exceeds = longest is not None and longest > EMA_SEGMENT_MAX_TASK_ROWS
    if exceeds:
        warnings.warn(
            f"q_ema/q_holt density probe: max series length {longest} > "
            f"{EMA_SEGMENT_MAX_TASK_ROWS} rows/key at {sf_dir}; "
            "dispatching to the SEGMENTED plan (tolerance-equal, not "
            "hash-identical, to the single-fold oracle form)",
            stacklevel=3,
        )
    _probe_cache[sf_dir] = exceeds
    return exceeds


def ema_single_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-shaped single fold: one hash shuffle on user_id,
    sorted-array fold per key (see q_ema's docstring). Bit-identical
    to DuckDB's list_reduce -- the hash-certified form -- but bounded
    by one task per key, so the registered q_ema dispatches away from
    it when the density probe crosses EMA_SEGMENT_MAX_TASK_ROWS."""
    events = load_table(spark, sf_dir, "events")
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    ema = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            acc * F.lit(0.75) + F.lit(0.25) * x
        ),
    )
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(ema, 6).alias("ema_value"),
        )
    )


def ema_segmented(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "1 hour",
) -> DataFrame:
    """The 100 TB EMA shape: two-level affine-composition fold.

    Stage 1 groups on (user_id, time_bucket) and folds each segment's
    observations into the affine summary (A, B) with A = 0.75^k and
    B = fold(B*0.75 + 0.25*x), plus the segment's first value and
    bucket timestamp. Segments are bounded by the bucket width, so no
    task ever holds an unbounded series. Stage 2 shuffles only the
    per-segment summaries (two doubles each) to the key level, composes
    them in bucket order ((A2*A1, A2*B1 + B2)), and applies the closed
    form ema_n = A_total * x_first + B_total, where x_first is the
    first value of the earliest bucket (the ema_1 = x_1 seed solved
    through the composed map).

    Equal to :func:`q_ema` up to float reassociation (the partial
    products regroup the same multiply-adds); the parity-certified
    query stays the single fold precisely because reassociated doubles
    cannot hash-compare. Returned unrounded for the tolerance test.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    seg = events.withColumn(
        "bucket", F.window("ts", segment)["start"]
    )
    ordered = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    # Per-segment affine summary: fold (A, B) over the ordered values;
    # also keep the segment's first value for the global seed.
    summary = F.aggregate(
        F.transform(ordered, lambda s: s["value"]),
        F.struct(
            F.lit(1.0).alias("a"),
            F.lit(0.0).alias("b"),
            F.lit(None).cast("double").alias("first_x"),
        ),
        lambda acc, x: F.struct(
            (acc["a"] * F.lit(0.75)).alias("a"),
            (acc["b"] * F.lit(0.75) + F.lit(0.25) * x).alias("b"),
            F.coalesce(acc["first_x"], x).alias("first_x"),
        ),
    )
    segs = seg.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("k"), summary.alias("s")
    )
    # Key-level composition over bucket-ordered segment summaries:
    # (A2,B2) o (A1,B1) = (A2*A1, A2*B1 + B2); seed solves to
    # A_total * x_first + B_total.
    per_key = F.sort_array(
        F.collect_list(F.struct(F.col("bucket"), F.col("s").alias("s")))
    )
    composed = F.aggregate(
        per_key,
        F.struct(
            F.lit(1.0).alias("a"),
            F.lit(0.0).alias("b"),
            F.lit(None).cast("double").alias("first_x"),
        ),
        lambda acc, seg_: F.struct(
            (seg_["s"]["a"] * acc["a"]).alias("a"),
            (seg_["s"]["a"] * acc["b"] + seg_["s"]["b"]).alias("b"),
            F.coalesce(acc["first_x"], seg_["s"]["first_x"]).alias(
                "first_x"
            ),
        ),
    )
    return (
        segs.groupBy("user_id")
        .agg(F.sum("k").alias("n_events"), composed.alias("c"))
        .select(
            "user_id",
            "n_events",
            (F.col("c")["a"] * F.col("c")["first_x"] + F.col("c")["b"])
            .alias("ema_value"),
        )
    )


# --------------------------------------------------------------------------
# Sweep-line interval concurrency: how many orders are OPEN (placed but
# not fully shipped) at once, peaked per month. The classic
# max-concurrent-intervals problem -- capacity planning over any
# interval table (open orders, active sessions, in-flight training
# shards) -- solved relationally with boundary deltas + one cumulative
# sum over the DAY DOMAIN, never a pairwise overlap join.
# --------------------------------------------------------------------------


@query(
    "q_interval_peak",
    oracle="""
    WITH spans AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d0,
             CAST(MAX(l.l_shipdate) AS DATE) + 1 AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, 1
    ),
    deltas AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM (
        SELECT d0 AS d, 1 AS delta FROM spans
        UNION ALL SELECT d1 AS d, -1 AS delta FROM spans
      ) GROUP BY 1
    ),
    run AS (
      SELECT d,
             CAST(SUM(net) OVER (
               ORDER BY d ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS open_cnt
      FROM deltas
    )
    SELECT CAST(date_trunc('month', d) AS TIMESTAMP) AS month,
           MAX(open_cnt) AS peak_open,
           CAST(COUNT(*) AS BIGINT) AS boundary_days
    FROM run GROUP BY 1
    """,
)
def q_interval_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of concurrently open orders per month (an order is
    open from its order date until its last lineitem ships), plus the
    number of boundary days observed in the month.

    The sweep-line shape: (1) per-order spans come from one
    orderkey-keyed aggregation (the interval end is MAX(l_shipdate),
    exclusive via +1 day); (2) each span emits a +1/-1 boundary delta
    and deltas hash-aggregate BY DAY -- after this step the problem is
    DOMAIN-SIZED (one row per distinct boundary day, ~2.4k days for
    TPC-H's 7-year span) no matter how many orders exist; (3) one
    cumulative sum over the day rows yields the open count at every
    boundary, and a month rollup takes the peak. No pairwise
    overlap join ever forms -- the O(n^2) interval-overlap product is
    replaced by O(n) deltas + O(days) prefix sum.

    Scale: the span aggregation and the delta aggregation are both
    mergeable hash aggs with map-side partials; the single-partition
    cumulative window runs over the bounded day domain (the
    q_mutual_info fold argument -- constant-size at any corpus scale).
    If the time domain itself were unbounded (sensor microseconds),
    the prefix sum tiers the same way q_dense_index does: per-range
    partials + broadcast offsets.

    tests/test_timeseries.py recomputes the monthly peaks in pure
    Python (third-engine check) and pins the global invariant that
    the running count returns to zero after the last boundary.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # aggregate BELOW the join (round 13, guide §2.3 "aggregate before
    # you shuffle"): the span end needs only MAX(l_shipdate) per
    # orderkey, so collapsing lineitem 4:1 first makes the fact-fact
    # join orderkey-unique on both sides -- same spans exactly (the
    # join key is the grouping key, and orders without lineitems drop
    # under the inner join either way). The spread is KEYED on the
    # grouping/join key (tables.keyed_spread), so ONE exchange serves
    # spread + collapse + the lineitem side of the join.
    proj = li.select("l_orderkey", "l_shipdate")
    proj = keyed_spread(
        spark, proj, table_path(sf_dir, "lineitem"), ["l_orderkey"]
    )
    ship = proj.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.date_add(F.max(F.col("l_shipdate").cast("date")), 1).alias("d1")
    )
    spans = orders.join(ship, "o_orderkey").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        "d1",
    )
    # both boundary deltas EXPLODE from one span row (round 13): the
    # former two-leg unionAll duplicated the span subtree -- the whole
    # fact-fact join executed once per leg (only its exchanges were
    # reused) -- while the explode is a narrow 2-row Generate over a
    # single join execution; the delta rows are identical
    deltas = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("d0").alias("d"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("d1").alias("d"), F.lit(-1).alias("delta")
                    ),
                )
            ).alias("x")
        )
        .select("x.d", "x.delta")
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    from pyspark.sql.window import Window as W

    run = deltas.withColumn(
        "open_cnt",
        F.sum("net").over(
            W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return run.groupBy(
        F.date_trunc("month", "d").alias("month")
    ).agg(
        F.max("open_cnt").alias("peak_open"),
        F.count(F.lit(1)).alias("boundary_days"),
    )


# --------------------------------------------------------------------------
# Time-decayed activity ranking: recent activity counts more, by a
# half-life. The standard formulation (sum of value * exp(-dt/tau))
# commits every engine to libm exp() and an order-dependent float sum;
# this operator instead decays by POWERS OF TWO per whole week --
# multiplying a double by 2^-k is exponent arithmetic (exact), and
# quantized micro-unit values make the whole aggregation exact
# integers: mergeable, shuffle-order-proof, and bit-identical across
# engines BY CONSTRUCTION rather than by tolerance.
# --------------------------------------------------------------------------

#: Decay clamp: contributions older than DECAY_WEEKS_MAX weeks all
#: carry the smallest weight (2^-DECAY_WEEKS_MAX) instead of vanishing
#: -- keeps the integer scaling bounded (max factor 2^10 = 1024).
DECAY_WEEKS_MAX = 10

#: Ranked rows to emit.
DECAY_TOP_K = 20


@query(
    "q_decay_topk",
    oracle=f"""
    WITH ref AS (
      SELECT MAX(ts) AS ref_ts FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
             LEAST({DECAY_WEEKS_MAX},
                   CAST(floor(date_diff('day', ts, ref.ref_ts) / 7.0)
                        AS BIGINT)) AS wk
      FROM events, ref
      WHERE value IS NOT NULL
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(vq * (1 << ({DECAY_WEEKS_MAX} - wk)))
                  AS DOUBLE) AS scaled
      FROM w GROUP BY 1
    )
    SELECT user_id, n_events,
           ROUND(scaled / {(1 << DECAY_WEEKS_MAX) * 1e6}, 6)
             AS decayed_score
    FROM s
    ORDER BY scaled DESC, user_id
    LIMIT {DECAY_TOP_K}
    """,
)
def q_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DECAY_TOP_K} users by exponentially time-decayed value sum:
    each event contributes value * 2^-(whole weeks before the stream's
    last timestamp), clamped at {DECAY_WEEKS_MAX} weeks.

    Engine-exactness by construction, not tolerance: values quantize
    to micro-unit integers (the shared floor(x*1e6 + 0.5) text), the
    decay multiplies by 1 << (clamp - weeks) -- an integer, so the
    weighted sum is an EXACT integer aggregation (DECIMAL(38,0)/
    HUGEINT sums; per-row peak vq*1024 ~ 5.7e11) -- and the single
    final division by 2^{DECAY_WEEKS_MAX}*1e6 is one correctly-rounded
    IEEE op. No exp(), no libm variance, no float-sum order
    sensitivity; the top-k cut compares exact integers, so both
    engines select identical rows.

    Scale: the reference timestamp is a 1-row broadcast (never a
    second corpus pass); the decayed sum is a plain mergeable hash
    aggregation -- map-side partials collapse per user -- and the
    ranking is TakeOrderedAndProject. A streaming twin keeps
    (scaled_sum, n) per key and RESCALES lazily when the reference
    advances a week (multiply state by 2^-1 -- exact), the classic
    decayed-counter trick; the clamp bounds state staleness.

    tests/test_timeseries.py recomputes the ranking in pure Python
    (third-engine check) and pins the decay monotonicity (moving an
    event one week later never lowers its user's score).
    """
    events = load_table(spark, sf_dir, "events")
    ref = events.agg(F.max("ts").alias("ref_ts"))
    w = (
        events.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .alias("vq"),
            F.least(
                F.lit(DECAY_WEEKS_MAX),
                F.floor(F.datediff("ref_ts", "ts") / 7.0).cast("long"),
            ).alias("wk"),
        )
    )
    s = w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (
                F.col("vq")
                * F.expr(f"shiftleft(1, {DECAY_WEEKS_MAX} - wk)")
            ).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("scaled"),
    )
    return (
        s.orderBy(F.desc("scaled"), "user_id")
        .limit(DECAY_TOP_K)
        .select(
            "user_id",
            "n_events",
            F.round(
                F.col("scaled") / ((1 << DECAY_WEEKS_MAX) * 1e6), 6
            ).alias("decayed_score"),
        )
    )


# --------------------------------------------------------------------------
# CUSUM drift detection: the classic change-point statistic -- the
# maximum drawdown of the cumulative deviation-from-target series.
# A mean shift of d per observation grows the statistic linearly in
# the post-change run length, while in-control noise mean-reverts;
# q_anomaly_mad flags individual outliers, this flags SUSTAINED drift.
# Multiplying through by n (deviation = n*x - total) keeps every
# cumulative quantity an exact integer: no per-type mean double ever
# enters the fold, so the max and its position are engine-exact.
# --------------------------------------------------------------------------

#: Final statistic normalization: the integer fold computes
#: n * cusum * 1e6 (micro-units, mean scaled through by n); one shared
#: IEEE division returns natural units.
_CUSUM = "CAST(stat AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)"


@query(
    "q_cusum",
    oracle=f"""
    WITH base AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS xq
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (
      SELECT event_type, ts, event_id, xq,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
             CAST(SUM(xq) OVER (PARTITION BY event_type) AS HUGEINT)
               AS t
      FROM base
    ),
    run AS (
      SELECT event_type, n,
             CAST(row_number() OVER w AS BIGINT) AS i,
             SUM(CAST(n AS HUGEINT) * CAST(xq AS HUGEINT) - t)
               OVER (w ROWS UNBOUNDED PRECEDING) AS s
      FROM tot
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    dd AS (
      SELECT event_type, n, i,
             s - MIN(s) OVER (
               PARTITION BY event_type ORDER BY i
               ROWS UNBOUNDED PRECEDING
             ) AS drawdown
      FROM run
    ),
    mx AS (
      SELECT event_type, n, i, drawdown,
             MAX(drawdown) OVER (PARTITION BY event_type) AS stat
      FROM dd
    )
    SELECT event_type,
           MAX(n) AS n_events,
           ROUND({_CUSUM}, 6) AS cusum,
           MIN(i) AS change_pos
    FROM mx WHERE drawdown = stat
    GROUP BY event_type, n, stat
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward CUSUM statistic per event type -- the maximum drawdown
    max_t (S_t - min_{s<=t} S_s) of the cumulative
    deviation-from-mean series in (ts, event_id) order -- plus the
    1-based position where it is first attained (the change-point
    estimate).

    Integer-exact by algebra: instead of folding x - mean (a double),
    the deviation is scaled through by n: D_t = n*x_t - total, so the
    running sum, running min, drawdown, max, and the argmin position
    are ALL exact integer comparisons (HUGEINT/DECIMAL(38,0) -- the
    products peak n*xq ~ 1e13 per row and the cumsum stays inside 128
    bits at any realistic scale). The per-type mean never exists as a
    float; one shared IEEE division normalizes the final statistic.

    The REGISTERED plan is the segmented fold
    (:func:`cusum_segmented`, VERDICT r8 ask #2): the oracle-shaped
    single sort (:func:`cusum_single_sort`) keys every window on
    event_type -- one task per type, the same measured bound as
    q_acf's -- while the segmented plan bounds per-task work by a
    time segment and combines bounded per-segment summaries. The two
    are EXACTLY equal (integer algebra throughout; the drawdown
    decomposes as a pointwise max -- see cusum_segmented), pinned as
    frame equality in tests/test_timeseries.py; the unchanged oracle
    hash-certifies the result cross-engine.

    tests/test_timeseries.py recomputes the statistic and change
    position in pure Python (third-engine check) and pins the
    invariants cusum >= 0 and change_pos <= n_events.
    """
    return cusum_segmented(spark, sf_dir)


def cusum_single_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-shaped single-sort CUSUM: one exchange, every window
    (count/total, running sum, running min, partition max) keyed on
    event_type sharing one sort. Correct at any scale but one task per
    type -- the registered q_cusum runs :func:`cusum_segmented`
    instead; this form anchors the segmented-equality pin."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        "ts",
        "event_id",
        F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").alias(
            "xq"
        ),
    )
    from pyspark.sql.window import Window as W

    part = W.partitionBy("event_type")
    ordered = part.orderBy("ts", "event_id")
    frame = ordered.rowsBetween(W.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    tot = base.select(
        "event_type",
        "ts",
        "event_id",
        "xq",
        F.count(F.lit(1)).over(part).alias("n"),
        F.sum(F.col("xq").cast(dec)).over(part).alias("t"),
    )
    run = tot.select(
        "event_type",
        "n",
        F.row_number().over(ordered).cast("long").alias("i"),
        F.sum(
            F.col("n").cast(dec) * F.col("xq").cast(dec) - F.col("t")
        )
        .over(frame)
        .alias("s"),
    )
    by_i = part.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    dd = run.select(
        "event_type",
        "n",
        "i",
        (F.col("s") - F.min("s").over(by_i)).alias("drawdown"),
    )
    mx = dd.select(
        "event_type",
        "n",
        "i",
        "drawdown",
        F.max("drawdown").over(part).alias("stat"),
    )
    return (
        mx.filter(F.col("drawdown") == F.col("stat"))
        .groupBy("event_type", "n", "stat")
        .agg(
            F.max("n").alias("n_events"),
            F.min("i").alias("change_pos"),
        )
        .select(
            "event_type",
            "n_events",
            F.round(F.expr(_CUSUM), 6).alias("cusum"),
            "change_pos",
        )
    )


def cusum_segmented(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "7 days",
) -> DataFrame:
    """The 100 TB CUSUM shape (and, since round 9, the plan q_cusum
    registers): per-segment integer partials + a summary-level
    combine, EXACTLY equal to the single sort.

    The algebra that makes it exact: with per-segment local prefix
    p_t, local running min m_t (both inclusive of the current row),
    segment-prefix offset off_b = sum of earlier segments' totals and
    gb_b = min over earlier segments of their (offset + full prefix
    min), the global drawdown of row t in segment b is

        off_b + p_t - min(gb_b, off_b + m_t)
          = max(p_t - m_t,  off_b + p_t - gb_b)

    -- subtracting a min IS a pointwise max, and max over t
    distributes over both branches. So each segment needs only FIVE
    integers (total P, full prefix min M, row count k, branch maxima
    A = max(p_t - m_t) and G = max(p_t), each with its FIRST
    attaining position via struct-max with a negated-position
    tiebreak), and the cross-segment combine runs over the
    (type x segment) summary table -- bounded metadata, q_dense_index's
    partials-plus-offsets discipline. A row attaining the global stat
    is in one of the branch argmax sets, so the first global position
    is the min of the active branches' first positions; every
    comparison is DECIMAL(38,0) integer arithmetic, hence segmented ==
    single-sort EXACTLY (tests/test_timeseries.py pins frame
    equality at several widths).

    The per-type (n, total) pair comes from a hash aggregation
    broadcast-joined back -- replacing the single sort's
    whole-partition window, which was itself a one-task-per-type
    stage."""
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        "ts",
        "event_id",
        F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").alias(
            "xq"
        ),
        F.window("ts", segment)["start"].alias("bucket"),
    )
    tots = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xq").cast(dec)).alias("t"),
    )
    rows = base.join(F.broadcast(tots), "event_type").select(
        "event_type",
        "bucket",
        "ts",
        "event_id",
        (F.col("n").cast(dec) * F.col("xq").cast(dec) - F.col("t")).alias(
            "d"
        ),
        "n",
    )
    from pyspark.sql.window import Window as W

    w_ord = W.partitionBy("event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    frame = w_ord.rowsBetween(W.unboundedPreceding, 0)
    staged = rows.select(
        "event_type",
        "bucket",
        "n",
        "d",
        F.row_number().over(w_ord).cast("long").alias("pos"),
        F.sum("d").over(frame).alias("p"),
    )
    by_pos = (
        W.partitionBy("event_type", "bucket")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    staged = staged.withColumn("m", F.min("p").over(by_pos))
    summaries = staged.groupBy("event_type", "bucket").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("d").alias("p_total"),
        F.min("p").alias("m_full"),
        F.max(
            F.struct(
                (F.col("p") - F.col("m")).alias("v"),
                (-F.col("pos")).alias("negpos"),
            )
        ).alias("amax"),
        F.max(
            F.struct(F.col("p").alias("v"), (-F.col("pos")).alias("negpos"))
        ).alias("gmax"),
    )
    wb = W.partitionBy("event_type").orderBy("bucket")
    excl = wb.rowsBetween(W.unboundedPreceding, -1)
    combined = summaries.select(
        "event_type",
        "bucket",
        "n",
        "k",
        "amax",
        "gmax",
        "m_full",
        F.coalesce(
            F.sum("p_total").over(excl), F.lit(0).cast(dec)
        ).alias("off"),
        F.coalesce(F.sum("k").over(excl), F.lit(0)).alias("cnt_off"),
    )
    combined = combined.withColumn(
        "gb", F.min(F.col("off") + F.col("m_full")).over(excl)
    )
    scored = combined.select(
        "event_type",
        "n",
        "cnt_off",
        "amax",
        "gmax",
        "off",
        "gb",
        F.greatest(
            F.col("amax")["v"],
            F.when(
                F.col("gb").isNotNull(),
                F.col("off") + F.col("gmax")["v"] - F.col("gb"),
            ),
        ).alias("dmax"),
    )
    part = W.partitionBy("event_type")
    ranked = scored.select(
        "event_type",
        "n",
        "cnt_off",
        "amax",
        "gmax",
        "off",
        "gb",
        "dmax",
        F.max("dmax").over(part).alias("stat"),
    )
    pos_cand = F.least(
        F.when(
            F.col("amax")["v"] == F.col("stat"),
            F.col("cnt_off") - F.col("amax")["negpos"],
        ),
        F.when(
            F.col("gb").isNotNull()
            & (F.col("off") + F.col("gmax")["v"] - F.col("gb")
               == F.col("stat")),
            F.col("cnt_off") - F.col("gmax")["negpos"],
        ),
    )
    return (
        ranked.filter(F.col("dmax") == F.col("stat"))
        .select("event_type", "n", "stat", pos_cand.alias("pos"))
        .groupBy("event_type", "n", "stat")
        .agg(F.min("pos").alias("change_pos"))
        .select(
            F.col("event_type"),
            F.col("n").alias("n_events"),
            F.round(F.expr(_CUSUM), 6).alias("cusum"),
            "change_pos",
        )
    )


# --------------------------------------------------------------------------
# Holt double exponential smoothing: level + trend, the EMA's
# trending sibling (EMA lags a drifting series; Holt tracks the drift
# and can forecast). Two COUPLED linear recurrences folded with the
# q_ema house shape -- both engines run the identical ordered fold, so
# the doubles are bit-equal cross-engine with no tolerance policy.
#
# Accumulator representation note (cross-engine trap, measured): a
# STRUCT accumulator in DuckDB's list_reduce is mutated FIELD BY FIELD
# -- an acc.l reference inside the 'b' expression sees the freshly
# written new level, silently turning the simultaneous update into a
# Gauss-Seidel sweep (observed: b3 = -3.5285 instead of -4.0709 on the
# fixture series). A flat LIST accumulator [l, b] evaluates all output
# elements from the immutable input accumulator in both engines, so
# the fold is the true simultaneous recurrence.
# --------------------------------------------------------------------------

#: Smoothing factors, both exact in binary floating point so each fold
#: step is the same IEEE op sequence in both engines. The fold uses the
#: EXPANDED linear form (l' = a*x + (1-a)l + (1-a)b; b' = ab*x - ab*l
#: + (1-ab... )) whose coefficients 0.75/0.0625/0.9375 are also exact.
HOLT_ALPHA = 0.25
HOLT_BETA = 0.25

#: Forecast horizon for the emitted projection (level + h * trend).
HOLT_H = 3


@query(
    "q_holt",
    oracle="""
    WITH srt AS (
      SELECT user_id,
             list_transform(
               list(value ORDER BY ts, event_id),
               x -> [CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)]
             ) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    folded AS (
      SELECT user_id, n_events,
             list_reduce(xs, (acc, e) -> [
               0.25 * e[1] + 0.75 * acc[1] + 0.75 * acc[2],
               0.0625 * e[1] - 0.0625 * acc[1] + 0.9375 * acc[2]
             ]) AS s
      FROM srt
    )
    SELECT user_id, n_events,
           ROUND(s[1], 6) AS level,
           ROUND(s[2], 6) AS trend,
           ROUND(s[1] + 3.0 * s[2], 6) AS forecast_h3
    FROM folded
    """,
)
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double exponential smoothing over the value
    stream in (ts, event_id) order: final level, final trend, and the
    3-step-ahead forecast level + 3*trend.

    Two coupled recurrences no window frame expresses (each step
    needs the FOLDED (l, b) pair): in expanded form
    l' = 0.25x + 0.75l + 0.75b and b' = 0.0625x - 0.0625l + 0.9375b
    (alpha = beta = 0.25; the textbook b' = B*(l'-l) + (1-B)*b with
    l' substituted -- all five coefficients exact binary fractions),
    seeded l_1 = x_1, b_1 = 0 via DuckDB list_reduce's
    seed-with-first-element, replicated in Spark by a NULL-accumulator
    branch (the q_ema discipline). The accumulator is a flat
    [l, b] LIST on both sides -- the struct form is a measured
    cross-engine trap (see the module comment: DuckDB mutates struct
    accumulators field-by-field, turning the simultaneous update into
    a sequential sweep). Every step is then the same IEEE
    multiply-add tree in both engines, so the emitted doubles are
    bit-identical before the final round(6).

    Scale -- DENSITY-DISPATCHED since round 9, the q_ema twin: one
    mergeable max-count probe, then this single fold while every key's
    series fits a task (the hash-certified plan at every driver SF) or
    :func:`holt_segmented` beyond the same measured
    EMA_SEGMENT_MAX_TASK_ROWS crossover -- the fold cost class is
    identical (user-keyed sorted-array fold over the same rows), so
    the EMA crossover table governs both. Each Holt step is AFFINE in
    (l, b): segments summarize to a 2x2 matrix + offset vector (six
    doubles) composing associatively exactly as ema_segmented's scalar
    (A, B) pairs do; the seed state [x1, 0] is a FIXED POINT of the
    first step (A·[x1,0] + k·x1 = [x1,0]), so no seed special-case
    survives into the algebra. Segmented equals this fold modulo float
    reassociation (pinned to tolerance in tests/test_timeseries.py).
    A streaming twin keeps (l, b, n) per key -- O(1) state, same
    ordered-arrival contract as streaming/ema.py.

    tests/test_timeseries.py recomputes the fold in pure Python with
    the same simultaneous update (third-engine check) and pins
    forecast_h3 == level + 3*trend.
    """
    if _series_exceeds_task_bound(spark, sf_dir):
        seg = holt_segmented(spark, sf_dir)
        return seg.select(
            "user_id",
            "n_events",
            F.round("level", 6).alias("level"),
            F.round("trend", 6).alias("trend"),
            F.round(F.col("level") + 3.0 * F.col("trend"), 6).alias(
                "forecast_h3"
            ),
        )
    return holt_single_fold(spark, sf_dir)


def holt_single_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-shaped single fold (see q_holt's docstring): one
    hash shuffle on user_id, flat-list accumulator, bit-identical to
    DuckDB list_reduce -- bounded by one task per key, so the
    registered q_holt dispatches away from it past the measured
    crossover."""
    events = load_table(spark, sf_dir, "events")
    srt = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                lambda s: s["value"],
            ).alias("xs"),
        )
    )
    folded = srt.withColumn(
        "s",
        F.expr(
            """
            aggregate(
              xs,
              CAST(NULL AS ARRAY<DOUBLE>),
              (acc, x) -> CASE WHEN acc IS NULL
                THEN array(CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE))
                ELSE array(
                  0.25D * x + 0.75D * acc[0] + 0.75D * acc[1],
                  0.0625D * x - 0.0625D * acc[0] + 0.9375D * acc[1])
              END
            )
            """
        ),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round(F.col("s")[0], 6).alias("level"),
        F.round(F.col("s")[1], 6).alias("trend"),
        F.round(F.col("s")[0] + 3.0 * F.col("s")[1], 6).alias(
            "forecast_h3"
        ),
    )


def holt_segmented(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "1 hour",
) -> DataFrame:
    """The 100 TB Holt shape: two-level affine-MATRIX composition (the
    2-dimensional generalization of ema_segmented).

    Each observation x acts on the state v = (l, b) as v -> A v + k x
    with A = [[0.75, 0.75], [-0.0625, 0.9375]] and k = (0.25, 0.0625)
    (alpha = beta = 0.25 in expanded form). Affine maps compose
    associatively, so stage 1 folds each (user, time_bucket) segment
    into (P, q) -- P the 2x2 matrix product, q the accumulated offset
    vector, six doubles -- plus the segment's first value; stage 2
    shuffles only those summaries to the key level, composes them in
    bucket order ((P2, q2) o (P1, q1) = (P2 P1, P2 q1 + q2)), and
    applies v_n = P_total [x_first, 0] + q_total. The seed works with
    NO special case because [x1, 0] is a fixed point of the first
    step: A [x1, 0] + k x1 = [x1, 0], so folding every observation
    uniformly from v0 = [x_first, 0] reproduces the textbook seeding
    exactly.

    Equal to :func:`holt_single_fold` up to float reassociation
    (tests/test_timeseries.py pins the tolerance); returned unrounded
    for that pin, with the same (user_id, n_events, level, trend)
    columns."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    seg = events.withColumn("bucket", F.window("ts", segment)["start"])
    ordered = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    # Per-segment fold of (p00, p01, p10, p11, q0, q1, first_x):
    # left-multiply by A and add k*x each step.
    summary = F.aggregate(
        F.transform(ordered, lambda s: s["value"]),
        F.struct(
            F.lit(1.0).alias("p00"),
            F.lit(0.0).alias("p01"),
            F.lit(0.0).alias("p10"),
            F.lit(1.0).alias("p11"),
            F.lit(0.0).alias("q0"),
            F.lit(0.0).alias("q1"),
            F.lit(None).cast("double").alias("first_x"),
        ),
        lambda acc, x: F.struct(
            (F.lit(0.75) * acc["p00"] + F.lit(0.75) * acc["p10"]).alias(
                "p00"
            ),
            (F.lit(0.75) * acc["p01"] + F.lit(0.75) * acc["p11"]).alias(
                "p01"
            ),
            (
                F.lit(-0.0625) * acc["p00"] + F.lit(0.9375) * acc["p10"]
            ).alias("p10"),
            (
                F.lit(-0.0625) * acc["p01"] + F.lit(0.9375) * acc["p11"]
            ).alias("p11"),
            (
                F.lit(0.75) * acc["q0"]
                + F.lit(0.75) * acc["q1"]
                + F.lit(0.25) * x
            ).alias("q0"),
            (
                F.lit(-0.0625) * acc["q0"]
                + F.lit(0.9375) * acc["q1"]
                + F.lit(0.0625) * x
            ).alias("q1"),
            F.coalesce(acc["first_x"], x).alias("first_x"),
        ),
    )
    segs = seg.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("k"), summary.alias("s")
    )
    per_key = F.sort_array(
        F.collect_list(F.struct(F.col("bucket"), F.col("s").alias("s")))
    )
    # (P2, q2) o (P1, q1): 2x2 matrix product + transformed offset.
    composed = F.aggregate(
        per_key,
        F.struct(
            F.lit(1.0).alias("p00"),
            F.lit(0.0).alias("p01"),
            F.lit(0.0).alias("p10"),
            F.lit(1.0).alias("p11"),
            F.lit(0.0).alias("q0"),
            F.lit(0.0).alias("q1"),
            F.lit(None).cast("double").alias("first_x"),
        ),
        lambda acc, e: F.struct(
            (
                e["s"]["p00"] * acc["p00"] + e["s"]["p01"] * acc["p10"]
            ).alias("p00"),
            (
                e["s"]["p00"] * acc["p01"] + e["s"]["p01"] * acc["p11"]
            ).alias("p01"),
            (
                e["s"]["p10"] * acc["p00"] + e["s"]["p11"] * acc["p10"]
            ).alias("p10"),
            (
                e["s"]["p10"] * acc["p01"] + e["s"]["p11"] * acc["p11"]
            ).alias("p11"),
            (
                e["s"]["p00"] * acc["q0"]
                + e["s"]["p01"] * acc["q1"]
                + e["s"]["q0"]
            ).alias("q0"),
            (
                e["s"]["p10"] * acc["q0"]
                + e["s"]["p11"] * acc["q1"]
                + e["s"]["q1"]
            ).alias("q1"),
            F.coalesce(acc["first_x"], e["s"]["first_x"]).alias(
                "first_x"
            ),
        ),
    )
    return (
        segs.groupBy("user_id")
        .agg(F.sum("k").alias("n_events"), composed.alias("c"))
        .select(
            "user_id",
            "n_events",
            (
                F.col("c")["p00"] * F.col("c")["first_x"]
                + F.col("c")["q0"]
            ).alias("level"),
            (
                F.col("c")["p10"] * F.col("c")["first_x"]
                + F.col("c")["q1"]
            ).alias("trend"),
        )
    )


# --------------------------------------------------------------------------
# Burst detection: trailing-baseline z-scores over the zero-filled
# daily rate -- the "did this metric spike today" alarm that CUSUM's
# whole-series drift statistic deliberately is not (CUSUM finds the
# one change point; this scores every day against its own local
# baseline). Counts are exact integers on a calendar spine, so the
# baseline moments are integer sums and the z closed form is one
# shared IEEE text.
# --------------------------------------------------------------------------

#: Trailing window length (full calendar days of history required
#: before a day is scored) and the two-sided alert threshold.
BURST_WINDOW = 7
BURST_Z = 3.0

#: z over (c, s, ss) with mean = s/7 and the population variance of
#: the trailing window, (7*ss - s*s)/49 -- all from exact integers,
#: cast once. Degenerate (constant) baselines emit NULL z.
_BURST_Z_EXPR = (
    "CASE WHEN (7.0 * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)"
    " * CAST(s AS DOUBLE)) > 0 THEN"
    " (CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / 7.0)"
    " / sqrt((7.0 * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)"
    " * CAST(s AS DOUBLE)) / 49.0)"
    " ELSE NULL END"
)


@query(
    "q_burst",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
      FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    filled AS (
      SELECT s.event_type, s.day, COALESCE(d.c, 0) AS c
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
    ),
    w AS (
      SELECT event_type, day, c,
             SUM(c) OVER tw AS s,
             SUM(c * c) OVER tw AS ss,
             CAST(COUNT(*) OVER tw AS BIGINT) AS k
      FROM filled
      WINDOW tw AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN {BURST_WINDOW} PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_type, day, c AS n_events,
           ROUND(CAST(s AS DOUBLE) / 7.0, 6) AS base_mean,
           ROUND({_BURST_Z_EXPR}, 6) AS z,
           COALESCE(({_BURST_Z_EXPR}) > {BURST_Z}, FALSE) AS is_burst
    FROM w WHERE k = {BURST_WINDOW}
    """,
)
def q_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily burst scores per event type: each calendar day's count
    against the mean/stddev of its own trailing {BURST_WINDOW} full
    days, with the z-score and the > {BURST_Z} alert flag. Days whose
    trailing baseline is constant (zero variance) score NULL and never
    alert; days without {BURST_WINDOW} full days of history are not
    scored.

    The calendar matters: a groupBy alone skips silent days, and a
    trailing ROWS frame over present-days-only would stretch the
    baseline across gaps -- so the counts land on a zero-filled day
    SPINE (the q_gapfill shape: per-type bounds -> sequence ->
    explode; |days| x |types| rows at any corpus size). Baseline
    moments are integer sums over the frame; the z and the alert
    predicate are one shared SQL text evaluated on both engines.

    Scale: the daily aggregation is the only corpus-proportional
    stage (mergeable, collapsing map-side to the day-domain); the
    window runs over the bounded spine. Hour-grain bursts swap the
    truncation and interval; per-user bursts swap the partition key
    and inherit the q_ema density argument instead of the domain
    bound.

    tests/test_timeseries.py recomputes every day's z in pure Python
    (third-engine check) and pins flag/threshold consistency.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        ),
    )
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("c", F.lit(0).cast("long")).alias("c"),
    )
    from pyspark.sql.window import Window as W

    tw = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-BURST_WINDOW, -1)
    )
    w = filled.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(tw).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("ss"),
        F.count(F.lit(1)).over(tw).alias("k"),
    )
    return w.filter(F.col("k") == BURST_WINDOW).select(
        "event_type",
        "day",
        F.col("c").alias("n_events"),
        F.round(F.col("s").cast("double") / 7.0, 6).alias("base_mean"),
        F.round(F.expr(_BURST_Z_EXPR), 6).alias("z"),
        F.coalesce(
            F.expr(_BURST_Z_EXPR) > BURST_Z, F.lit(False)
        ).alias("is_burst"),
    )


# --------------------------------------------------------------------------
# SAX: symbolic aggregate approximation of the daily-volume series --
# the time-series compression that makes series INDEXABLE (equal
# words bucket together for similarity search, the q_near_dedup
# blocking idea applied to shapes). z-normalize, piecewise-aggregate
# into SAX_SEGMENTS, discretize by literal Gaussian breakpoints; all
# aggregation happens in EXACT integers (daily counts, segment sums)
# with floats only in per-row closed forms, so the word is
# hash-stable cross-engine.
# --------------------------------------------------------------------------

#: SAX geometry: 30-day horizon -> SAX_SEGMENTS of SAX_SEG_DAYS each;
#: 4-letter alphabet split at the standard Gaussian quartile
#: breakpoints (literals -- no distribution functions near data).
SAX_SEGMENTS = 6
SAX_SEG_DAYS = 5
SAX_BREAKS = ("-0.6744897501960817", "0.0", "0.6744897501960817")

#: Shared closed forms over exact integer sufficient statistics:
#: population mean/std of the 30 daily counts, the segment's PAA value
#: in z-space, and the 0-3 bucket via breakpoint comparisons (ties go
#: DOWN: bucket = count of breakpoints strictly below).
_SAX_MEAN = "(CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))"
_SAX_STD = (
    "(sqrt(CAST(nd AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / CAST(nd AS DOUBLE))"
)
_SAX_PAA = (
    "((CAST(sy AS DOUBLE) / CAST(cnt AS DOUBLE) - mean) / std)"
)
_SAX_BUCKET = " + ".join(
    f"(CASE WHEN paa > {b} THEN 1 ELSE 0 END)" for b in SAX_BREAKS
)


@query(
    "q_sax",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(y) AS BIGINT) AS sx,
             CAST(SUM(y * y) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    ),
    seg AS (
      SELECT event_type, x // {SAX_SEG_DAYS} AS seg,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM daily GROUP BY 1, 2
    ),
    z AS (
      SELECT s.event_type, s.seg,
             {_SAX_PAA.replace('mean', f'({_SAX_MEAN})')
                      .replace('std', f'({_SAX_STD})')} AS paa
      FROM seg s JOIN stats ON stats.event_type = s.event_type
    ),
    lettered AS (
      SELECT event_type, seg,
             chr(97 + ({_SAX_BUCKET})) AS ch,
             ROUND(paa, 6) AS paa
      FROM z
    )
    SELECT l.event_type,
           stats.nd AS n_days,
           string_agg(l.ch, '' ORDER BY l.seg) AS word,
           ROUND({_SAX_MEAN}, 6) AS mean_daily,
           ROUND({_SAX_STD}, 6) AS std_daily
    FROM lettered l JOIN stats ON stats.event_type = l.event_type
    GROUP BY l.event_type, stats.nd, stats.sx, stats.sxx
    """,
)
def q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX word per event type over the 30-day daily-volume series:
    z-normalize against the series' own mean/std, average into
    SAX_SEGMENTS piecewise segments (PAA), discretize by the literal
    Gaussian quartile breakpoints into a 4-letter word -- the symbolic
    form under which similar shapes collide (equal words = candidate
    pairs for shape similarity, the blocking primitive for indexing a
    million series).

    Exactness discipline end to end: daily counts, the series'
    (n, sum, sum-of-squares) and each segment's (sum, count) are exact
    integer aggregations; mean, std, and each segment's PAA z-value
    are per-row shared IEEE texts over those integers; the letter is
    integer comparisons against breakpoint literals (ties bucket DOWN
    deterministically -- no libm, no float aggregation anywhere). The
    word assembles by an explicitly seg-ordered fold in both engines.

    Scale: the corpus collapses to (type, day) in one mergeable pass;
    everything after is |types| x SAX_SEGMENTS rows. Longer horizons
    change SAX_SEG_DAYS, not the shape; per-entity series (SAX per
    user, indexing millions of words) swap the grouping key and feed
    the word into the q_dedup blocking machinery unchanged.

    tests/test_timeseries.py recomputes the words in pure Python
    (third-engine check) and pins the SAX contract: words are
    lowercase a-d of length SAX_SEGMENTS, and a z-shifted copy of a
    series (same shape, different scale) yields the SAME word.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
            .cast("long")
            .alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("y").alias("sx"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
    )
    seg = daily.groupBy(
        "event_type", F.expr(f"x DIV {SAX_SEG_DAYS}").alias("seg")
    ).agg(F.sum("y").alias("sy"), F.count(F.lit(1)).alias("cnt"))
    mean_t = f"({_SAX_MEAN})"
    std_t = f"({_SAX_STD})"
    z = seg.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "seg",
        "nd",
        "sx",
        "sxx",
        F.expr(
            _SAX_PAA.replace("mean", mean_t).replace("std", std_t)
        ).alias("paa"),
    )
    lettered = z.select(
        "event_type",
        "seg",
        "nd",
        "sx",
        "sxx",
        F.expr(f"chr(97 + ({_SAX_BUCKET}))").alias("ch"),
    )
    return lettered.groupBy("event_type", "nd", "sx", "sxx").agg(
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(struct(seg, ch))), s -> s.ch), '')"
        ).alias("word")
    ).select(
        "event_type",
        F.col("nd").alias("n_days"),
        "word",
        F.round(F.expr(_SAX_MEAN), 6).alias("mean_daily"),
        F.round(F.expr(_SAX_STD), 6).alias("std_daily"),
    )
