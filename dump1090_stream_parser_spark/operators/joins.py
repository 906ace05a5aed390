"""Tier B relational surface, part 2: joins (SURVEY.md §2.2 join rows).

SQLite executes every one of these as a nested loop; Spark picks
broadcast-hash / shuffled-hash / sort-merge per side sizes, and AQE can
re-decide at runtime. Scale notes per query document the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import scaled_int
from ..tables import load_table
from .registry import query

# --------------------------------------------------------------------------
# Inner equi-join: the 5-way star (SURVEY.md §2.2 "Join: inner equi").
# region/nation are tiny dims -> explicit broadcast; customer/orders join
# shuffles on the fact side only. At 100 TB lineitem⋈orders co-location is
# the expensive step: bucket both by orderkey (see plans/layout.py).
# --------------------------------------------------------------------------


@query(
    "q_join_star",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_items,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY r_name, n_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join with dim broadcast + fact-side date filter pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(
                    scaled_int(F.col("l_extendedprice"))
                    * scaled_int(1 - F.col("l_discount"))
                )
                / 10000.0
            ).alias("revenue"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) / 100.0
             AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders
    (SURVEY.md §2.2 "Join: left outer")."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(F.sum(scaled_int(F.col("o_totalprice"))), F.lit(0))
                / 100.0
            ).alias("total_spent"),
        )
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT c_custkey, 'active' AS status FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, 'inactive' AS status FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI (SURVEY.md §2.2 "Join: semi/anti") -- the
    IN / NOT EXISTS subquery shapes as explicit join types."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    active = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("active").alias("status"))
    inactive = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("inactive").alias("status"))
    return active.unionAll(inactive)


# --------------------------------------------------------------------------
# Theta/range join (SURVEY.md §2.2 "Join: theta/range"). The bucket dim is
# tiny -> BroadcastNestedLoopJoin is the right plan; at scale with a large
# band table, bucketize the point side to the band grid and equi-join on
# bucket id + residual filter (SURVEY.md §4.3 pattern).
# --------------------------------------------------------------------------

_BUCKETS = [
    ("xs", 0.0, 1.0),
    ("s", 1.0, 10.0),
    ("m", 10.0, 100.0),
    ("l", 100.0, 1000.0),
    ("xl", 1000.0, 1e18),
]

_BUCKETS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BUCKETS)


@query(
    "q_join_range",
    oracle=f"""
    WITH buckets(bucket, lo, hi) AS (VALUES {_BUCKETS_SQL})
    SELECT bucket,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value
    FROM events
    JOIN buckets ON value >= lo AND value < hi
    GROUP BY bucket
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join of events.value into value bands."""
    events = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(_BUCKETS, "bucket string, lo double, hi double")
    return (
        events.join(
            F.broadcast(buckets),
            (events.value >= buckets.lo) & (events.value < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int(F.col("value"), 1000000)) / 1000000.0).alias(
                "sum_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# As-of join (SURVEY.md §2.2 "Join: as-of", §4.3): Spark has no ASOF
# operator; the idiomatic rewrite is union both sides, then
# last(..., ignorenulls) over an ordered window -- ONE shuffle by key,
# no per-row correlated lookup. Scales linearly in rows.
# --------------------------------------------------------------------------


@query(
    "q_asof_lastval",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT s.value
            FROM events s
            WHERE s.user_id = e.user_id
              AND s.event_type = 'signup'
              AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))
            ORDER BY s.ts DESC, s.event_id DESC
            LIMIT 1) AS last_signup_value
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
)
def q_asof_lastval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: for each purchase, the most recent signup value at-or-before
    it (per user). Rewrite: single window pass, not a correlated subquery."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = events.withColumn(
        "last_signup_value",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_signup_value"
    )


@query(
    "q_join_snowflake",
    oracle="""
    SELECT p_brand, n_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
             AS gross_revenue
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 25
    GROUP BY p_brand, n_name
    """,
)
def q_join_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join over the supply-side dimensions (part -> lineitem
    <- supplier -> nation): revenue per brand and supplier nation. part
    and supplier scale with SF but stay dimension-sized relative to the
    fact -- leave them to AQE (broadcast when they fit, shuffle when
    not); only the constant-sized nation is forced broadcast. The part
    filter prunes before the join, so pushdown reaches the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            (F.sum(scaled_int(F.col("l_extendedprice"))) / 100.0).alias(
                "gross_revenue"
            ),
        )
    )


@query(
    "q_join_full",
    oracle="""
    WITH o AS (
      SELECT date_trunc('day', o_orderdate) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT date_trunc('day', l_shipdate) AS d, COUNT(*) AS n_ships
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.d, s.d) AS d,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_ships, 0) AS n_ships
    FROM o FULL JOIN s ON o.d = s.d
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (completes the join-type surface): daily order
    placements vs daily line-item shipments, keeping days that appear
    on only one side (shipments trail orders by up to ~4 months, so
    both tails are genuinely one-sided). Both inputs are pre-aggregated
    to |days| rows BEFORE the join -- the full-outer exchange carries
    two date-keyed count tables, never fact rows; at 100 TB the join
    stays a few-thousand-row sort-merge regardless of fact size."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(F.count("*").alias("n_orders"))
    s = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.count("*").alias("n_ships")
    )
    return o.join(s, "d", "full").select(
        "d",
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0).cast("long")).alias("n_ships"),
    )
