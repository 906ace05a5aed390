"""Plan-quality gates (SURVEY.md §4 / the 100 TB posture).

Correctness tests say the answers are right; these say the *plans* are
the ones that survive a 100x scale-up: filters reach the scan, scans
are column-pruned, small dims broadcast, codegen covers the hot path.
"""

from __future__ import annotations

from dump1090_stream_parser_spark.operators.joins import q_join_star
from dump1090_stream_parser_spark.operators.relational import (
    q_filter_range,
    q_group_topk,
    q_project_cast,
)
from dump1090_stream_parser_spark.plans.inspect import (
    codegen_stage_count,
    formatted_plan,
    join_strategies,
    pushed_filters,
    read_schemas,
)

from .conftest import SF_DIR


def test_filter_range_predicates_pushed(spark):
    pf = pushed_filters(q_filter_range(spark, SF_DIR))
    # range + inequality predicates all reach the parquet reader
    assert "GreaterThanOrEqual(l_shipdate" in pf
    assert "LessThan(l_shipdate" in pf
    assert "GreaterThanOrEqual(l_quantity,10" in pf
    assert "Not(EqualTo(l_returnflag,A))" in pf


def test_project_cast_prunes_columns(spark):
    rs = read_schemas(q_project_cast(spark, SF_DIR))
    # 6 of 11 lineitem columns read; the rest must not appear
    for needed in ("l_orderkey", "l_quantity", "l_extendedprice"):
        assert needed in rs
    for pruned in ("l_shipdate", "l_suppkey", "l_partkey", "l_linestatus"):
        assert pruned not in rs


def test_star_join_broadcasts_dims(spark):
    strats = join_strategies(q_join_star(spark, SF_DIR))
    # nation/region explicitly broadcast; no cartesian anywhere
    assert strats.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in strats
    assert "BroadcastNestedLoopJoin" not in strats


def test_topk_avoids_global_sort(spark):
    plan = formatted_plan(q_group_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # top-k, not Sort+Limit


def test_flagship_runs_in_codegen(spark):
    assert codegen_stage_count(q_group_topk(spark, SF_DIR)) >= 1
