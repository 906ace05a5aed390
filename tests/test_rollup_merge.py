"""Incremental rollup maintenance (operators/rollup_merge.py): the
merge identity holds against a direct single-pass rollup, and the
split really is adversarial (cells fed by both halves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.rollup_merge import (
    _partial_rollup,
    q_rollup_merge,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_merged_equals_direct(spark):
    merged = {
        (r["bucket"], r["event_type"]): (
            r["n_events"],
            r["value_cents"],
            r["n_with_user"],
        )
        for r in q_rollup_merge(spark, SF_DIR).collect()
    }
    direct = {
        (r["bucket"], r["event_type"]): (
            r["n_events"],
            r["value_cents"],
            r["n_with_user"],
        )
        for r in _partial_rollup(
            load_table(spark, SF_DIR, "events")
        ).collect()
    }
    assert merged == direct


def test_split_is_adversarial(spark):
    """Most cells must receive rows from BOTH halves -- otherwise the
    merge degenerates to an append and proves nothing."""
    ev = load_table(spark, SF_DIR, "events")
    both = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.countDistinct(F.expr("event_id % 2")).alias("halves"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    fed_by_both = both.filter("halves = 2").count()
    multi = both.filter("n >= 2").count()
    # cells are sparse at sf0.001 (most hold one row), but the merge
    # path needs real coverage: a healthy share of multi-row cells
    # must span both parities, and in absolute numbers too
    assert fed_by_both >= max(20, multi // 2)
