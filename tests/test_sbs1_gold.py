"""Non-vacuity + invariant pins for the SBS-1 gold queries.

The parity suite proves Spark == DuckDB on these; what it cannot prove
is that the fault-injected replay still INJECTS anything. If testdata
drift ever made a fault class empty (no fragments, no empty slots),
q_sbs1_gold_deadletter would keep hash-matching while certifying
nothing -- these assertions make that failure loud.
"""

from __future__ import annotations

from dump1090_stream_parser_spark.operators.sbs1_gold import (
    q_sbs1_gold_deadletter,
    q_sbs1_gold_latest,
)

from .conftest import SF_DIR


def test_deadletter_gold_fault_classes_all_fire(spark):
    row = q_sbs1_gold_deadletter(spark, SF_DIR).collect()[0]
    # every injected fault class must be non-empty at this SF
    assert row.n_dead_letter > 0
    assert row.n_altitude_null > 0
    assert row.n_lat_null > 0
    # ...and must not have consumed the clean path entirely
    assert row.n_clean > row.n_dead_letter
    assert row.n_clean > row.n_altitude_null


def test_deadletter_gold_routing_invariants(spark):
    row = q_sbs1_gold_deadletter(spark, SF_DIR).collect()[0]
    # every dead-lettered fragment preserves its raw line
    assert row.n_dead_raw_intact == row.n_dead_letter
    # lat and lon are blanked together (same selector)
    assert row.n_lat_null == row.n_lon_null
    # callsign is empty on EVERY MSG,3 line: ''->NULL must hold on all
    # clean rows -- the regression this query exists to catch
    assert row.n_callsign_null == row.n_clean
    # surviving altitudes are real values, not zeroed
    assert row.sum_altitude > 0


def test_gold_latest_covers_every_aircraft(spark):
    from dump1090_stream_parser_spark.tables import load_table
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.operators.sbs1_gold import (
        _MAPPED_NOT_NULL_SQL,
    )

    gold = q_sbs1_gold_latest(spark, SF_DIR)
    n_aircraft = (
        load_table(spark, SF_DIR, "events")
        .filter(_MAPPED_NOT_NULL_SQL)  # the SAME shared predicate
        .select("user_id")
        .distinct()
        .count()
    )
    rows = gold.collect()
    assert len(rows) == n_aircraft  # one latest row per aircraft
    total = gold.agg(F.sum("n_msgs")).collect()[0][0]
    assert total > n_aircraft  # counts aggregate the full stream
