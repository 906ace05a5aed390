"""Tier C extension: Pareto-dominance (skyline) analytics (SURVEY.md
§2 north-star adjacency -- "best tradeoff" queries: cheapest-largest
part, highest-quality-shortest document, best accuracy-per-token
checkpoint. A row is on the skyline iff no other row is at least as
good on every axis and strictly better on one).

The 2D skyline here (minimize p_size, maximize p_retailprice) avoids
the O(n^2) dominance self-join entirely: dominance against the whole
catalog reduces to dominance against the per-size maxima, and those
maxima form a DOMAIN-SIZED table (|distinct sizes| rows). One hash
aggregation + a domain-sized prefix scan + one broadcast join-back
decide every row.

Reference parity note: the reference script has no dominance operator
(its analytics stop at SQLite GROUP BY views); this module is part of
the mandated training-data extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from .registry import query


@query(
    "q_skyline",
    oracle="""
    WITH m AS (
      SELECT p_size, MAX(p_retailprice) AS best
      FROM part GROUP BY 1
    ),
    pre AS (
      SELECT p_size, best,
             MAX(best) OVER (
               ORDER BY p_size
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_smaller
      FROM m
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    JOIN pre ON pre.p_size = p.p_size
    WHERE p.p_retailprice = pre.best
      AND (pre.best_smaller IS NULL
           OR p.p_retailprice > pre.best_smaller)
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D Pareto skyline of the part catalog: every part for which no
    other part is both no-larger (p_size) and no-cheaper
    (p_retailprice), with strictness on at least one axis. Equal
    (size, price) twins are mutually non-dominating, so all of them
    are emitted.

    Dominance against n rows collapses to dominance against the
    per-size maxima: a part is on the skyline iff it CARRIES its
    size's maximum price AND that price strictly beats the best price
    at every strictly smaller size. So the plan is (1) one hash
    aggregation to the |sizes|-row maxima table, (2) a prefix-max
    window over that DOMAIN-SIZED table (strictly-preceding frame
    implements the strict-dominance tiebreak: an equal-price smaller
    part dominates, an equal-price same-size part does not), (3) one
    broadcast join-back + filter over the catalog. Prices are
    2-decimal doubles, so every comparison is exact -- no epsilon, no
    rounding policy to share.

    Scale: no dominance self-join ever forms (the naive skyline is
    O(n^2) pairs); the corpus is touched by exactly two narrow scans
    (the agg and the verify), the shuffle carries |sizes| rows, and
    the join-back is broadcast by construction. For skylines over
    continuous axes (no small domain to collapse onto) the same
    algebra tiers: per-partition LOCAL skylines merge -- dominance is
    transitive, so local survivors are a superset of the global
    skyline -- which is the mapPartitions form this operator would
    take at 100 TB with high-cardinality axes.

    tests/test_skyline.py brute-forces the O(n^2) dominance check in
    Python at sf0.001 (third-engine ground truth).
    """
    part = load_table(spark, sf_dir, "part")
    m = part.groupBy("p_size").agg(F.max("p_retailprice").alias("best"))
    pre = m.withColumn(
        "best_smaller",
        F.max("best").over(
            Window.orderBy("p_size").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
    )
    return (
        part.join(F.broadcast(pre), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("best"))
            & (
                F.col("best_smaller").isNull()
                | (F.col("p_retailprice") > F.col("best_smaller"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )
