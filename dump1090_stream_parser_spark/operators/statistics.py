"""Tier C extension: closed-form statistical models over exact sums
(SURVEY.md §2 north-star "text analysis / quality scoring" adjacency --
the curation question behind them is "how does metric Y move with
metric X inside each slice", answered at 100 TB without sampling).

Per-group ordinary least squares fits y = a + b*x from the five
sufficient statistics (n, Sx, Sy, Sxy, Sxx) -- a pure partial+final
hash aggregation, no second pass, no driver math. The house exact-sum
discipline (functions/exact.py) applies: money/quantity doubles are
2-decimal values, so every sufficient statistic is an exact scaled
integer and the ONLY float arithmetic is the closed-form division at
the end, shared as one SQL text between Spark and DuckDB so the rounded
coefficients hash-compare.

Why not Spark's built-in ``regr_slope``/``regr_r2`` (or DuckDB's): both
fold doubles in engine-specific partial/final order, so their results
are shuffle-order-dependent -- the exact class the driver's value hash
exists to catch. Sufficient statistics in integers sidestep it and are
also the mergeable form a streaming twin would keep as state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

#: Closed-form OLS over the aggregated doubles (rn, sx, sy, sxy, sxx,
#: syy) -- one shared text per coefficient so both engines evaluate the
#: identical IEEE operation tree. Cent-unit identities: slope is
#: unit-invariant (cents/cents); the intercept comes out in y-cents per
#: x-cent and one final /100 returns it to natural units; r2 is scale-
#: free. The sums arrive as exact integers (DECIMAL(38,0) in Spark,
#: HUGEINT in DuckDB) cast once to double: below 2^53 (every test SF)
#: the conversion is exact, beyond it both casts are correctly-rounded
#: IEEE from the same exact integer.
_OLS_SLOPE = "(rn * sxy - sx * sy) / (rn * sxx - sx * sx)"
_OLS_INTERCEPT = "((sy * sxx - sx * sxy) / (rn * sxx - sx * sx)) / 100.0"
_OLS_R2 = (
    "((rn * sxy - sx * sy) * (rn * sxy - sx * sy))"
    " / ((rn * sxx - sx * sx) * (rn * syy - sy * sy))"
)


@query(
    "q_regression",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 100) AS BIGINT) AS xq,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yq
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) AS rn,
             CAST(SUM(xq) AS DOUBLE) AS sx,
             CAST(SUM(yq) AS DOUBLE) AS sy,
             CAST(SUM(xq * yq) AS DOUBLE) AS sxy,
             CAST(SUM(xq * xq) AS DOUBLE) AS sxx,
             CAST(SUM(yq * yq) AS DOUBLE) AS syy
      FROM c GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, n_rows,
           ROUND({_OLS_SLOPE}, 6) AS slope,
           ROUND({_OLS_INTERCEPT}, 6) AS intercept,
           ROUND({_OLS_R2}, 6) AS r2
    FROM s
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit of extendedprice against quantity: slope,
    intercept, and r-squared for every (returnflag, linestatus) slice.

    One partial+final hash aggregation computes the five sufficient
    statistics as EXACT integers -- quantities and prices are 2-decimal
    doubles, so cent-scaled longs sum without FP order sensitivity
    (per-row products peak ~5e10, inside int64; the SUMS are kept in
    DECIMAL(38,0)/HUGEINT so web-scale row counts cannot wrap, the
    q_window_trailing fixed-point discipline extended to second
    moments). The closed-form coefficients are then one shared SQL
    text over the six doubles, so Spark and DuckDB run the identical
    IEEE tree and the round(6) results hash-compare.

    Scale: sufficient statistics ARE the mergeable sketch -- map-side
    partial aggregation collapses each partition to five numbers per
    group, the shuffle carries |groups| rows, and a streaming twin
    would keep the same five numbers as state with O(1) merge. This is
    the shape regr_slope/regr_covar_pop cannot deliver cross-engine:
    their internal double folds are association-order-dependent (the
    float-SUM hash-break class), while integer sums commute.

    tests/test_statistics.py pins the coefficients against numpy
    lstsq on the same slices (third-engine check) and the r2 in [0,1]
    envelope.
    """
    li = load_table(spark, sf_dir, "lineitem")
    xq = F.round(F.col("l_quantity") * 100, 0).cast("long")
    yq = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dec = "decimal(38,0)"
    s = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            xq.alias("xq"),
            yq.alias("yq"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.lit(1)).cast("double").alias("rn"),
            F.sum(F.col("xq").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("yq").cast(dec)).cast("double").alias("sy"),
            F.sum((F.col("xq") * F.col("yq")).cast(dec))
            .cast("double")
            .alias("sxy"),
            F.sum((F.col("xq") * F.col("xq")).cast(dec))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("yq") * F.col("yq")).cast(dec))
            .cast("double")
            .alias("syy"),
        )
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.round(F.expr(_OLS_SLOPE), 6).alias("slope"),
        F.round(F.expr(_OLS_INTERCEPT), 6).alias("intercept"),
        F.round(F.expr(_OLS_R2), 6).alias("r2"),
    )
