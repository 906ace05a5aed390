"""Tier B relational surface, part 1: scan / project / filter / aggregate /
set ops / strings / time / JSON / rollup / subqueries / arrays / math.

The reference delegates ALL querying to SQLite SQL over the ``squitters``
table (SURVEY.md §2.2); these queries re-express that capability contract
idiomatically over the driver's testdata star schema so the DuckDB oracle
can verify them value-for-value. Each query cites the SURVEY.md §2.2 row
it covers.

Determinism rules applied throughout (driver hashes values):
- every computed column is aliased identically in Spark and oracle SQL;
- per-row double arithmetic is left UNROUNDED (IEEE ops are bit-identical
  across engines) and ``round()`` is never applied at a value's own
  decimal precision (engines disagree on boundary halves);
- money/double SUMs are computed in exact scaled-integer space (cents)
  and divided once at the end, so FP association order can't differ;
- sums/avgs of integer-valued columns are exact as-is;
- any ORDER BY ... LIMIT carries a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import scaled_int
from ..functions.geo import haversine_km, haversine_sql
from ..tables import load_table
from .registry import query

# --------------------------------------------------------------------------
# Aggregation: hash-agg + top-k (SURVEY.md §2.2 "Aggregation: hash-agg",
# "Sort/limit/top-k"; the reference's #1 use-case -- messages per aircraft,
# Appendix A's `SELECT hex_ident, COUNT(*) ... ORDER BY ... LIMIT`).
# Physical shape to preserve at scale: partial agg -> shuffle by key ->
# final agg -> TakeOrderedAndProject (no global sort).
# --------------------------------------------------------------------------


@query(
    "q_group_topk",
    oracle="""
    SELECT user_id, COUNT(*) AS n_msgs
    FROM events
    GROUP BY user_id
    ORDER BY n_msgs DESC, user_id
    LIMIT 10
    """,
)
def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 busiest entities -- the flagship (SURVEY.md §7.3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_msgs"))
        .orderBy(F.desc("n_msgs"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "q_distinct_aircraft",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_msgs
    FROM events
    """,
)
def q_distinct_aircraft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Aircraft seen' = COUNT(DISTINCT key) (SURVEY.md §2.2).

    Exact here; at 100 TB swap in approx_count_distinct (HLL sketch) --
    same shape, no extra shuffle for the approximate variant.
    """
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_msgs"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(*) AS n_items,
      COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
      SUM(CASE WHEN l_discount > 0.05
               THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l_discount) * 100) AS BIGINT) END)
        / 10000.0 AS discounted_revenue,
      AVG(l_quantity) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates: COUNT(CASE WHEN ...) (SURVEY.md §2.2)."""
    li = load_table(spark, sf_dir, "lineitem")
    discounted = F.col("l_discount") > 0.05
    # Exact: cents(price) * cents(1-discount) is an integer number of
    # "basis-point cents"; the sum is exact, one division at the end.
    rev_units = scaled_int(F.col("l_extendedprice")) * scaled_int(
        1 - F.col("l_discount")
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.count(F.when(discounted, 1)).alias("n_discounted"),
        (F.sum(F.when(discounted, rev_units)) / 10000.0).alias(
            "discounted_revenue"
        ),
        F.avg("l_quantity").alias("avg_qty"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets -- capability gap vs the SQLite-era dialect
    (SURVEY.md §2.2 "Grouping sets"); free in Spark."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY.md §2.2 "Grouping sets"): all 2^n
    grouping combinations in one pass -- the expand happens before the
    shuffle, so it is one aggregation, not 2^n scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )


#: HLL++ relative standard deviation requested by q_approx_distinct.
APPROX_DISTINCT_RSD = 0.02
#: Certification band: 5x the requested rsd (a ~5-sigma envelope), with
#: an absolute floor of 16 for tiny groups where integer-granularity
#: estimates dominate the relative bound. HLL++ is deterministic for a
#: given input, so a pass at a given SF is stable round over round.
APPROX_DISTINCT_TOL = 5.0


@query(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_msgs,
           TRUE AS hll_within_bounds
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++), SELF-CERTIFYING (SURVEY.md §2.2
    "Aggregation: distinct"; VERDICT r5 #2): the 100 TB story is the
    sketch -- it merges map-side, so the shuffle carries kilobytes per
    partition where exact COUNT(DISTINCT) shuffles every key once. The
    estimate itself is engine-specific, so instead of exporting it
    (the r1-red rows-only shape) this query exports the EXACT distinct
    count plus ``hll_within_bounds``: |estimate - exact| must sit
    inside a 5x-rsd envelope (absolute floor 16 for tiny groups; HLL++
    is exact in its sparse regime anyway). The oracle recomputes the
    exact counts and emits literal TRUE -- full value-hash coverage of
    both the exact math and the sketch's accuracy contract. The exact
    twin exists here as the certification harness; a production run at
    100 TB keeps only the sketch aggregation (and the exact-distinct
    cost tier is pinned separately by q_distinct_aircraft)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", APPROX_DISTINCT_RSD).alias("_est"),
        F.count("*").alias("n_msgs"),
    )
    band = F.greatest(
        F.lit(16.0),
        F.lit(APPROX_DISTINCT_TOL * APPROX_DISTINCT_RSD)
        * F.col("n_users").cast("double"),
    )
    return agg.select(
        "event_type",
        "n_users",
        "n_msgs",
        (
            F.abs(F.col("_est").cast("double") - F.col("n_users"))
            <= band
        ).alias("hll_within_bounds"),
    )


@query(
    "q_group_concat",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT parity (SURVEY.md §2.2): order-stable via array_sort so
    the concatenation is deterministic under distributed collect_list."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("names"),
    )


# --------------------------------------------------------------------------
# Projection / filter (SURVEY.md §2.2 "Projection", "Filter/predicates").
# The point at scale: both must reach the parquet scan (PushedFilters /
# ReadSchema pruning) -- verified in tests/test_plans.py.
# --------------------------------------------------------------------------


@query(
    "q_project_cast",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity AS BIGINT) AS qty_int,
      l_extendedprice * (1 - l_discount) AS net_price,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
      upper(l_returnflag) AS flag_uc
    FROM lineitem
    """,
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with casts and computed expressions (SURVEY.md §2.2).

    Mirrors the Bronze->Silver cast discipline (SQLite affinity replaced
    by explicit casts, SURVEY.md §1.3). Column-pruned scan: only 6 of 11
    lineitem columns should appear in ReadSchema.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        F.upper("l_returnflag").alias("flag_uc"),
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_quantity BETWEEN 10 AND 20
      AND l_returnflag <> 'A'
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + inequality predicates (SURVEY.md §2.2 "Filter/predicates");
    all four predicates push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") != "A")
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY.md §2.2 "Set ops").
# --------------------------------------------------------------------------


@query(
    "q_set_ops",
    oracle="""
    WITH early AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ),
    late AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    )
    SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
    UNION ALL
    SELECT o_custkey, 'early_only' AS cohort FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result (SURVEY.md §2.2)."""
    orders = load_table(spark, sf_dir, "orders")
    early = (
        orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
        .distinct()
    )
    late = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
        .distinct()
    )
    both = early.intersect(late).withColumn("cohort", F.lit("both"))
    early_only = early.subtract(late).withColumn("cohort", F.lit("early_only"))
    return both.unionAll(early_only)


# --------------------------------------------------------------------------
# Strings / time / JSON (SURVEY.md §2.2 "String fns", "Date/time fns",
# "JSON fns"). The reference's callsign-cleanup and hourly-bucketing
# workloads, re-expressed.
# --------------------------------------------------------------------------


@query(
    "q_string_clean",
    oracle="""
    SELECT
      c_custkey,
      upper(trim(c_name)) AS name_uc,
      replace(c_name, '#', '-') AS name_dashed,
      substring(c_name, 10) AS name_tail,
      length(c_name) AS name_len,
      CASE WHEN c_mktsegment LIKE '%MACH%' THEN 1 ELSE 0 END AS is_machinery
    FROM customer
    WHERE c_name LIKE '%1%'
    """,
)
def q_string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cleanup surface (SURVEY.md §2.2): the callsign-trim workload
    (8-char padded callsigns) generalized to trim/upper/replace/substr/
    length/LIKE."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_name").like("%1%")).select(
        "c_custkey",
        F.upper(F.trim(F.col("c_name"))).alias("name_uc"),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.substring("c_name", 10, 2147483647).alias("name_tail"),
        F.length("c_name").alias("name_len"),
        F.when(F.col("c_mktsegment").like("%MACH%"), 1).otherwise(0).alias(
            "is_machinery"
        ),
    )


@query(
    "q_time_bucket",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value
    FROM events
    GROUP BY hour_ts
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly bucketing (SURVEY.md §2.2 "Date/time fns"): the batch twin of
    the streaming tumbling window (`F.window(ts, '1 hour')`)."""
    events = load_table(spark, sf_dir, "events")
    # date_trunc upcasts ntz -> timestamp; cast back so collect() is
    # timezone-independent (matches the oracle's naive TIMESTAMP).
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_ts")
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(scaled_int(F.col("value"), 1000000)) / 1000000.0).alias(
            "sum_value"
        ),
    )


@query(
    "q_sliding_window",
    oracle="""
    SELECT date_trunc('minute', ts) - to_minutes(k) AS window_start,
           COUNT(*) AS n_events
    FROM events, (SELECT unnest(generate_series(0, 9)) AS k)
    GROUP BY window_start
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts, batch twin of
    `F.window(ts, '10 minutes', '1 minute')` (SURVEY.md §2.2 "Streaming:
    sliding window"). Spark expands each row into window/slide = 10
    panes before the shuffle -- exactly the oracle's generate_series
    expansion. Epoch-aligned minute slides make the pane starts equal
    date_trunc('minute', ts) - k minutes for k in 0..9."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "1 minute"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
        )
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
           AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (SURVEY.md §2.2 "JSON fns") over
    events.props -- `get_json_object`, no schema inference needed."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(k).alias("n_with_k"),
        F.avg(k).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# Subqueries (SURVEY.md §2.2 "Subqueries") -- exercised through spark.sql
# so Catalyst's decorrelation/rewrite-to-semijoin path is what runs.
# --------------------------------------------------------------------------


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      AND o_orderkey NOT IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
      )
    GROUP BY o_orderpriority
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries; Catalyst rewrites to left-semi / null-aware
    anti join (SURVEY.md §2.2 "Subqueries", "Join: semi/anti")."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 / CAST(100 AS DOUBLE) AS sum_price
        FROM v_orders
        WHERE o_custkey IN (SELECT c_custkey FROM v_customer WHERE c_acctbal > 5000)
          AND o_orderkey NOT IN (
            SELECT l_orderkey FROM v_lineitem WHERE l_quantity > 49
          )
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# Arrays (SURVEY.md §2.2 "Array/map fns") over embeddings ARRAY<FLOAT>.
# --------------------------------------------------------------------------


@query(
    "q_array_explode",
    oracle="""
    SELECT label,
           i - 1 AS pos,
           COUNT(*) AS n,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS avg_val
    FROM embeddings, generate_series(1, 4) AS g(i)
    GROUP BY label, pos
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over ARRAY<FLOAT> (first 4 dims), agg by (label, pos).

    The explode multiplies rows 4x BEFORE the shuffle; at scale prefer
    slicing first (as here) so the shuffle carries only needed elements.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.slice("embedding", 1, 4)))
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("col").cast("double")), 6).alias("avg_val"),
        )
    )


# --------------------------------------------------------------------------
# Math / geo (SURVEY.md §2.2 "Math fns"): haversine as a composed Catalyst
# expression. Testdata has no lat/lon, so coordinates are derived
# deterministically from integer keys -- identical derivation in the oracle.
# --------------------------------------------------------------------------

_HAV_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 120 AS DOUBLE) - 60.0 + 0.25 AS lat,
             CAST(c_custkey % 300 AS DOUBLE) - 150.0 + 0.5 AS lon
      FROM customer
    )
    SELECT c_custkey,
           ROUND({haversine_sql('lat', 'lon', '48.35', '11.78')}, 3) AS dist_km
    FROM pts
"""


@query("q_haversine", oracle=_HAV_ORACLE)
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance, JVM-side trig, no UDF (SURVEY.md §2.2 "Math fns")."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 120).cast("double") - 60.0 + 0.25).alias("lat"),
        ((F.col("c_custkey") % 300).cast("double") - 150.0 + 0.5).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        F.round(
            haversine_km(F.col("lat"), F.col("lon"), F.lit(48.35), F.lit(11.78)), 3
        ).alias("dist_km"),
    )


# --------------------------------------------------------------------------
# Sessionization (SURVEY.md §2.2 "Streaming: session window" batch twin):
# lag-gap algorithm; the streaming path uses F.session_window.
# --------------------------------------------------------------------------


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
             AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flight-leg style sessionization: 30-min inactivity gap splits a
    session (SURVEY.md §2.2; reference users reconstruct flight legs
    offline the same way). One shuffle by user_id serves both windows."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros for sub-second exactness (ts is µs-precision TIMESTAMP_NTZ;
    # session tz is UTC so the cast is a no-op on the stored instant).
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > 1800 * 1000000), 1
    ).otherwise(0)
    flagged = events.select(
        "user_id", "event_id", "ts", "value", new_session.alias("new_session")
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.sum(scaled_int(F.col("value"), 1000000)) / 1000000.0).alias(
            "session_value"
        ),
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (SURVEY.md §2.2 "Math
    fns" tier): a single sort-based aggregate serves all three
    quantiles. At 100 TB swap in approx_percentile (t-digest sketch) --
    same shape, mergeable map-side state instead of a per-group sort."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias(
            "p50_price"
        ),
        F.count("*").alias("n_items"),
    )


@query(
    "q_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6)
             AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (SURVEY.md §2.2 "Math fns" tier): stddev /
    variance / correlation / covariance in one partial+final pass.
    Rounded at 6 decimals: both engines use the textbook estimators but
    accumulate in different orders, so trailing bits differ."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "covar_qty_price"
        ),
    )


_MONTHS = list(range(1, 13))


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
    """
    + ",\n    ".join(
        # CAST: DuckDB types SUM(int) as HUGEINT, which the driver's
        # pandas canon reads as float64 while Spark emits int64.
        f"CAST(SUM(CASE WHEN month(l_shipdate) = {m} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS m{m}"
        for m in _MONTHS
    )
    + """
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: ship-month columns per return flag (SURVEY.md §2.2
    aggregation tier). Fixed pivot values keep the plan one aggregation
    pass (no value-discovery job) -- the form that scales."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    return (
        li.groupBy("l_returnflag")
        .pivot("ship_month", _MONTHS)
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            *[
                F.coalesce(F.col(f"`{m}`"), F.lit(0)).cast("bigint").alias(f"m{m}")
                for m in _MONTHS
            ],
        )
    )


N_SALTS = 16


@query(
    "q_group_salted",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase salted aggregation (SURVEY.md §4.3 / the 100 TB
    skew playbook): phase 1 aggregates by (key, salt) so one hot key
    spreads over N_SALTS reducers; phase 2 combines the per-salt partials
    by key. Result is identical to a plain GROUP BY -- count and the
    scaled-integer sum are associative -- which is what the oracle
    verifies. Spark's own partial aggregation covers mild skew already;
    explicit salting is for the one-key-dominates case where a single
    reducer would otherwise receive most of the data."""
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(scaled_int(F.col("value"), 1000000)).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("pv") / 1000000.0).alias("sum_value"),
    )


#: GK-sketch accuracy for q_approx_percentile: guaranteed rank error
#: <= n / accuracy (Spark approx_percentile contract).
APPROX_PCT_ACCURACY = 10_000


@query(
    "q_approx_percentile",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS cents
      FROM lineitem
    ),
    vc AS (
      SELECT l_returnflag, cents, COUNT(*) AS cnt
      FROM c GROUP BY l_returnflag, cents
    ),
    w AS (
      SELECT l_returnflag, cents,
             CAST(SUM(cnt) OVER (PARTITION BY l_returnflag
                                 ORDER BY cents) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT)
               AS n_items
      FROM vc
    )
    SELECT l_returnflag,
           MAX(n_items) AS n_items,
           MIN(CASE WHEN cum >= (n_items + 1) // 2 THEN cents END)
             AS p50_cents,
           MIN(CASE WHEN cum >= (9 * n_items + 9) // 10 THEN cents END)
             AS p90_cents,
           TRUE AS p50_within_bounds,
           TRUE AS p90_within_bounds
    FROM w GROUP BY l_returnflag
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile, SELF-CERTIFYING (SURVEY.md §2.2 math-fns tier;
    VERDICT r5 #1): the 100 TB story is the mergeable GK quantile sketch
    -- bounded map-side state, the shuffle carries sketches, not values.
    A sketch estimate is engine-specific, so instead of exporting it
    (rows-only, no driver signal) this query exports the EXACT discrete
    percentiles plus a ``within_bounds`` boolean that pins the sketch's
    documented error contract: the GK value's rank must lie within
    n/accuracy of the target rank. The oracle recomputes the exact
    percentiles and emits literal TRUE -- a full value-hash row that
    fails if either the exact math or the sketch guarantee breaks.

    Exactness across engines: quantities quantize to integer cents and
    the discrete percentile is "smallest value whose cumulative count
    reaches ceil(q*n)", with ceil done in integer arithmetic
    ((n+1) DIV 2, (9n+9) DIV 10) -- no float rank formula to disagree
    on. The exact side runs on per-VALUE counts (l_quantity has ~100
    distinct cent values per flag), so its window sort is over a
    value-histogram, not rows: at 100 TB the heavy pass is the
    (flag, cents) partial-agg -- same shape as q_group_topk -- and the
    cumulative scan is driver-trivial. The sketch side is the plain
    one-pass approx_percentile a production run would keep on its own."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    c = li.select("l_returnflag", cents.alias("cents"))
    vc = c.groupBy("l_returnflag", "cents").agg(F.count("*").alias("cnt"))
    wcum = Window.partitionBy("l_returnflag").orderBy("cents")
    wall = Window.partitionBy("l_returnflag")
    w = vc.select(
        "l_returnflag",
        "cents",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_items"),
    )
    rank50 = F.expr("(n_items + 1) DIV 2")
    rank90 = F.expr("(9 * n_items + 9) DIV 10")
    # GK rank-error budget (+1 slack for the ceil boundary itself)
    err = F.expr(f"n_items DIV {APPROX_PCT_ACCURACY} + 1")

    def value_at(rank: F.Column) -> F.Column:
        return F.min(F.when(F.col("cum") >= rank, F.col("cents")))

    exact = w.groupBy("l_returnflag").agg(
        F.max("n_items").alias("n_items"),
        value_at(rank50).alias("p50_cents"),
        value_at(rank90).alias("p90_cents"),
        value_at(F.greatest(rank50 - err, F.lit(1))).alias("_p50_lo"),
        value_at(F.least(rank50 + err, F.col("n_items"))).alias("_p50_hi"),
        value_at(F.greatest(rank90 - err, F.lit(1))).alias("_p90_lo"),
        value_at(F.least(rank90 + err, F.col("n_items"))).alias("_p90_hi"),
    )
    sketch = c.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "cents", F.array(F.lit(0.5), F.lit(0.9)), APPROX_PCT_ACCURACY
        ).alias("qq")
    )
    return exact.join(F.broadcast(sketch), "l_returnflag").select(
        "l_returnflag",
        "n_items",
        "p50_cents",
        "p90_cents",
        F.element_at("qq", 1)
        .between(F.col("_p50_lo"), F.col("_p50_hi"))
        .alias("p50_within_bounds"),
        F.element_at("qq", 2)
        .between(F.col("_p90_lo"), F.col("_p90_hi"))
        .alias("p90_within_bounds"),
    )


# --------------------------------------------------------------------------
# Data profiling: the ingest-gate summary every pipeline runs before
# trusting a new delivery (null rates, cardinalities, ranges per
# column). One pass, partial-agg friendly.
# --------------------------------------------------------------------------

#: Columns profiled on the events table (pipeline config).
PROFILE_COLS = ("user_id", "event_type", "value")


@query(
    "q_profile",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      {", ".join(
          f"CAST(COUNT({c}) AS BIGINT) AS {c}_filled, "
          f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_distinct"
          for c in PROFILE_COLS
      )},
      CAST(MIN(user_id) AS BIGINT) AS user_id_min,
      CAST(MAX(user_id) AS BIGINT) AS user_id_max,
      MIN(value) AS value_min,
      MAX(value) AS value_max
    FROM events
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile of the events delivery: fill
    counts (COUNT(col) skips NULLs), distinct cardinalities, and
    numeric ranges per profiled column -- the gate a pipeline checks
    before promoting a delivery. All aggregates are partial+final, so
    at 100 TB one scan produces the whole profile; the multiple
    COUNT(DISTINCT) columns expand to one aggregation with multiple
    distinct groups, which Spark plans as an expand + two-level agg
    (the standard multi-distinct plan)."""
    events = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.count(c).alias(f"{c}_filled"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
    aggs += [
        F.min("user_id").alias("user_id_min"),
        F.max("user_id").alias("user_id_max"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    ]
    return events.agg(*aggs)


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(floor(CAST((SELECT SUM(CAST(round(o2.o_totalprice * 100, 0)
                                       AS BIGINT))
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey) AS DOUBLE)
                      / (SELECT COUNT(*) FROM orders o4
                         WHERE o4.o_custkey = o.o_custkey)) AS BIGINT)
             AS cust_avg_cents
    FROM orders o
    WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT)
          * (SELECT COUNT(*) FROM orders o5
             WHERE o5.o_custkey = o.o_custkey)
          > 2 * (SELECT SUM(CAST(round(o3.o_totalprice * 100, 0) AS BIGINT))
                 FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subquery (SURVEY.md §2.2 "Subqueries"):
    orders costing more than twice their customer's average, phrased
    as a LATERAL correlated aggregate so Catalyst decorrelates ONE
    per-customer (sum, count) aggregate and joins it back -- the
    rewrite SQLite would run as a nested loop per row.

    Formulation measured (sf0.01, AQE final plans): the naive form
    with four independent scalar subqueries in SELECT/WHERE plans
    FIVE scans of orders + 8 exchanges (Spark 4.1's
    MergeScalarSubqueries does not merge these), the LATERAL form 3
    scans + 4 exchanges; the hand-rewritten window-over-custkey
    equivalent is the 1-scan/1-exchange floor but exercises no
    subquery machinery at all -- q_window_trailing already certifies
    that tier. The lateral form is registered: it certifies genuine
    correlated-subquery decorrelation at the lowest scan multiplier
    the declarative form achieves. (The oracle keeps the naive
    4-subquery SQL -- DuckDB's own decorrelation -- so the hash match
    also proves the two formulations agree.)

    Cross-engine exactness: the comparison is n*cents > 2*sum_cents --
    pure integer arithmetic (prices quantized to exact cents before
    any aggregation), so no float SUM order or rounding-at-half can
    flip a row; the exported average is an exact integer floor."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sc")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(floor(CAST(t.sum_cents AS DOUBLE) / t.cnt) AS BIGINT)
                 AS cust_avg_cents
        FROM v_orders_sc o,
        LATERAL (SELECT SUM(CAST(round(o2.o_totalprice * 100, 0)
                                 AS BIGINT)) AS sum_cents,
                        COUNT(*) AS cnt
                 FROM v_orders_sc o2
                 WHERE o2.o_custkey = o.o_custkey) t
        WHERE CAST(round(o.o_totalprice * 100, 0) AS BIGINT) * t.cnt
              > 2 * t.sum_cents
        """
    )


@query(
    "q_unpivot",
    oracle="""
    WITH m AS (
      SELECT 'quantity' AS metric,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS cents
      FROM lineitem
      UNION ALL
      SELECT 'price', CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(round(l_discount * 100, 0) AS BIGINT)
      FROM lineitem
    )
    SELECT metric, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM m GROUP BY metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of q_pivot): three measure columns
    become (metric, value) rows via ``stack`` -- a Generate inside the
    row, so the wide-to-long reshape is narrow and the only exchange is
    the 3-key rollup. Values quantize to integer cents pre-aggregation
    for cross-engine-exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        F.expr(
            "stack(3, "
            " 'quantity', CAST(round(l_quantity * 100, 0) AS BIGINT),"
            " 'price',    CAST(round(l_extendedprice * 100, 0) AS BIGINT),"
            " 'discount', CAST(round(l_discount * 100, 0) AS BIGINT)"
            ") AS (metric, cents)"
        )
    )
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
    )


@query(
    "q_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM events GROUP BY 1
    )
    SELECT s.hour,
           COALESCE(n, 0) AS n_events,
           COALESCE(sum_cents, 0) AS sum_cents
    FROM spine s LEFT JOIN hourly h ON h.hour = s.hour
    """,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the resample primitive): an hour SPINE
    generated from the data's own bounds (sequence + explode -- no
    table of hours needs to exist), left-joined with hourly aggregates
    so silent gaps become explicit zero rows. A groupBy alone cannot
    produce a row for an hour with no events; monitoring, rate
    calculations, and windowed models all need the zeros.

    Scale shape: the spine is |hours| rows (tiny at any corpus size --
    a year is 8,760 rows) built from a 1-row bounds aggregate, so the
    join broadcasts the spine side or the hourly side, never the raw
    events; values are exact integer cents."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_cents"
        ),
    )
    return spine.join(hourly, "hour", "left").select(
        "hour",
        F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
        F.coalesce("sum_cents", F.lit(0).cast("long")).alias("sum_cents"),
    )


#: Entity cap for the LOCF demo query: bounds the per-user spine so the
#: oracle comparison stays small; the plan shape is cap-independent.
LOCF_MAX_USER = 16


@query(
    "q_locf",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, value FROM events WHERE user_id < {LOCF_MAX_USER}
    ),
    bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM ev GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(round(max_by(value, ts) * 100, 0) AS BIGINT)
               AS last_cents_in_hour
      FROM ev GROUP BY user_id, date_trunc('hour', ts)
    ),
    joined AS (
      SELECT s.user_id, s.hour, h.last_cents_in_hour,
             h.hour IS NULL AS is_gap
      FROM spine s
      LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hour = s.hour
    )
    SELECT user_id, hour, is_gap,
           last_value(last_cents_in_hour IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried_cents
    FROM joined
    """,
)
def q_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward resampling: per-user hourly
    spine (bounded by each user's own activity window), hours with no
    events flagged as gaps and filled with the most recent observed
    value -- the fill primitive behind sensor/state dashboards, here
    over a capped user set so the demo output stays small (the plan
    shape is cap-independent).

    Shape: per-user spine via sequence+explode off a |users|-row
    bounds aggregate; ONE shuffle by user_id serves the spine join and
    the last(ignorenulls) ordered window (the same union+last trick as
    the as-of join). In-hour ties resolve by max_by(value, ts) --
    latest event wins, deterministic because (user, ts) is unique in
    this data; values are exact integer cents."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < LOCF_MAX_USER)
        .select("user_id", "ts", "value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        ),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.round(F.max_by("value", "ts") * 100, 0)
        .cast("long")
        .alias("last_cents_in_hour"),
        # join-miss marker: is_gap must mean "no hourly row", NOT
        # "last_cents_in_hour IS NULL" -- the two diverge if value is
        # ever NULL (an hour of only-NULL values is present, not a gap),
        # and the oracle's `h.hour IS NULL` tests presence
        F.lit(True).alias("_present"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.col("last_cents_in_hour"),
        F.col("_present").isNull().alias("is_gap"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        "is_gap",
        F.last("last_cents_in_hour", ignorenulls=True)
        .over(w)
        .alias("carried_cents"),
    )
