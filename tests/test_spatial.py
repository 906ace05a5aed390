"""q_spatial_join: grid-blocked radius self-join.

Three legs beyond the registry parity gate (which already compares the
grid plan against the grid-blocked DuckDB oracle):

1. the coverage inequalities that make the blocking LOSSLESS (any pair
   within R shares adjacent cells) hold with real margin;
2. the grid result equals a grid-free all-pairs DuckDB run (the
   blocking-losslessness certificate on data);
3. the plan is the intended shape: one hash equi-join on the cell key,
   no cartesian product, two exchanges.
"""

from __future__ import annotations

import math

from dump1090_stream_parser_spark.functions.geo import (
    EARTH_RADIUS_KM,
    haversine_sql,
)
from dump1090_stream_parser_spark.operators.spatial import (
    _CELL_LAT_I,
    _CELL_LON_I,
    _LAT_I,
    _LON_I,
    SPATIAL_R_KM,
    q_spatial_join,
)
from dump1090_stream_parser_spark.testing import compare

from .conftest import SF_DIR

#: Degree pitch of the synthetic lattice (0.0025 deg per index step).
_PITCH = 0.0025
#: Highest latitude any synthetic point can reach (lat in [30, 70)).
_PHI_MAX_DEG = 70.0


def test_cell_coverage_margins():
    """A pair within R km spans < 1 lat cell and < 1 lon cell, so the
    3x3 neighborhood join is lossless (module-docstring inequalities)."""
    dlat_max_deg = math.degrees(SPATIAL_R_KM / EARTH_RADIUS_KM)
    lat_cell_deg = _CELL_LAT_I * _PITCH
    assert dlat_max_deg < lat_cell_deg, (dlat_max_deg, lat_cell_deg)

    dlon_max_deg = math.degrees(
        2.0
        * math.asin(
            math.sin(SPATIAL_R_KM / (2.0 * EARTH_RADIUS_KM))
            / math.cos(math.radians(_PHI_MAX_DEG))
        )
    )
    lon_cell_deg = _CELL_LON_I * _PITCH
    assert dlon_max_deg < lon_cell_deg, (dlon_max_deg, lon_cell_deg)
    # and the margin is real, not a float hair: >= 1% of the cell
    assert dlon_max_deg < 0.99 * lon_cell_deg


def test_grid_equals_all_pairs(spark, oracle):
    """Blocking-losslessness certificate: the grid plan reproduces a
    grid-FREE all-pairs DuckDB run exactly (count, nearest, distance)."""
    hav = haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    brute = f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_LAT_I} AS lat_i, {_LON_I} AS lon_i
      FROM customer
    ),
    p AS (
      SELECT id, 30.0 + lat_i * 0.0025 AS lat,
             -10.0 + lon_i * 0.0025 AS lon
      FROM pts
    ),
    cand AS (
      SELECT * FROM (
        SELECT a.id AS id, b.id AS nb, {hav} AS d
        FROM p a JOIN p b ON TRUE
      ) t WHERE d <= {SPATIAL_R_KM}
    ),
    agg AS (
      SELECT id, CAST(COUNT(*) - 1 AS BIGINT) AS n_within
      FROM cand GROUP BY id
    ),
    nn AS (
      SELECT id, nb AS nn_id, ROUND(d, 3) AS nn_dist_km
      FROM (
        SELECT id, nb, d,
               row_number() OVER (PARTITION BY id ORDER BY d, nb) AS rn
        FROM cand WHERE nb <> id
      ) t WHERE rn = 1
    )
    SELECT agg.id AS c_custkey, agg.n_within, nn.nn_id, nn.nn_dist_km
    FROM agg LEFT JOIN nn ON nn.id = agg.id
    """
    problems = compare(q_spatial_join(spark, SF_DIR), oracle, brute)
    assert not problems, problems


def test_spatial_join_has_some_neighbors(spark):
    """The radius is calibrated so sf0.001 already exercises non-NULL
    neighbor rows (the oracle comparison is not vacuously all-zero)."""
    rows = q_spatial_join(spark, SF_DIR).collect()
    assert len(rows) > 0
    with_nb = [r for r in rows if r["n_within"] > 0]
    assert len(with_nb) >= 2, len(with_nb)
    for r in with_nb:
        assert r["nn_id"] is not None
        assert 0.0 <= r["nn_dist_km"] <= SPATIAL_R_KM


def test_spatial_join_plan_shape(spark):
    """One hash equi-join on the cell key (never a cartesian /
    broadcast-nested-loop), one x9 Generate, two exchanges."""
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    from dump1090_stream_parser_spark.plans.inspect import (
        spread_exchange_count,
    )

    plan = formatted_plan(q_spatial_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Generate") >= 1, plan
    # <= 2 KEYED exchanges; the conditional scan_spread (round 13,
    # absent at production split counts) is counted separately
    assert plan.count(") Exchange") - spread_exchange_count(plan) <= 2, plan
