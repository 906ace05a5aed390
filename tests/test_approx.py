"""Accuracy gate for sketch-based operators (no oracle: estimates are
engine-specific, so correctness is bounded-error vs the exact answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.relational import (
    q_approx_distinct,
    q_distinct_aircraft,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        # rsd=0.02 requested; allow 5 sigma
        assert abs(est - exact[k]) <= max(0.10 * exact[k], 2), (
            k,
            est,
            exact[k],
        )


def test_approx_and_exact_total_agree(spark):
    total_exact = q_distinct_aircraft(spark, SF_DIR).collect()[0]["n_users"]
    est = (
        load_table(spark, SF_DIR, "events")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - total_exact) <= max(0.10 * total_exact, 2)


def test_approx_percentile_close_to_exact(spark):
    from dump1090_stream_parser_spark.operators.relational import (
        q_approx_percentile,
        q_percentile,
    )

    exact = {
        r["l_returnflag"]: (r["p50_qty"], r["p90_qty"])
        for r in q_percentile(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p50_qty"], r["p90_qty"])
        for r in q_approx_percentile(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for flag, (p50, p90) in exact.items():
        a50, a90 = approx[flag]
        # l_quantity spans 1..50; accuracy=10000 keeps rank error tiny
        assert abs(a50 - p50) <= 1.0, (flag, a50, p50)
        assert abs(a90 - p90) <= 1.0, (flag, a90, p90)
