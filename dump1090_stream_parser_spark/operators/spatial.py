"""Spatial proximity join (SURVEY.md §2.2 "Math fns" extended to the
pair form a reference user actually wants over squitter positions:
"which aircraft were within R km of each other").

The reference's users run great-circle math per ROW (q_haversine's
shape); the missing operator is the PAIR form -- a radius self-join --
whose naive expression is an O(n^2) cross join. Here it is a
GRID-BLOCKED equi-join: every point lands in an integer (cell_x,
cell_y) bucket sized so that any pair within R km is guaranteed to sit
in the same or an adjacent cell, one side explodes to its 3x3 cell
neighborhood, and the pair space becomes a hash equi-join on the cell
key -- bounded by cell occupancy, never by n^2. Testdata has no
lat/lon, so coordinates derive deterministically from integer keys
(the q_haversine convention), identically in the oracle.

Cell-size proof (documented because the blocking is only lossless if
it holds): with R = 75 km and points in lat [30, 70), lon [-10, 70):

- haversine(p, q) >= EARTH_R * |dphi|, so a pair within R spans
  |dlat| <= 75 / 6371.0088 rad = 0.6745 deg < 0.75 (the lat cell).
- haversine(p, q) >= 2 * EARTH_R * asin(cos(phi_max) * sin(|dlon|/2)),
  so |dlon| <= 2 * asin(sin(75 / (2 * 6371.0088)) / cos(70 deg))
  = 1.9721 deg < 2.0 (the lon cell).

Both margins are asserted numerically in tests/test_spatial.py, and
the grid result is certified against a grid-free all-pairs DuckDB run
at sf0.001 (the blocking-losslessness certificate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import haversine_km, haversine_sql
from ..tables import load_table
from .registry import query

#: Radius of the proximity predicate, km.
SPATIAL_R_KM = 75.0

#: Deterministic point synthesis: integer lattice indices first (exact
#: in both engines), then one float scaling -- lat in [30, 70) at
#: 0.0025-degree pitch, lon in [-10, 70) at the same pitch. The text
#: is shared verbatim with the oracle so every double is bit-identical.
#: The mix is QUADRATIC in the key on purpose: an affine mix makes
#: pair distances depend only on the key gap (a low-discrepancy
#: lattice whose minimum pair distance exceeds R at small n -- zero
#: matching pairs, a vacuous test), while the quadratic scatter yields
#: near pairs at every SF (13 at sf0.001, 762 at sf0.01, 84k at
#: sf0.1). int64-exact while c_custkey * c_custkey * 11 < 2^63, i.e.
#: keys below ~9.1e8 -- five orders past the largest testdata SF.
_LAT_I = "(c_custkey * c_custkey * 7 + c_custkey * 13 + 5) % 16000"
_LON_I = "(c_custkey * c_custkey * 11 + c_custkey * 29 + 3) % 32000"
_LAT = "30.0 + lat_i * 0.0025"
_LON = "-10.0 + lon_i * 0.0025"

#: Grid cells as INTEGER division of the lattice index (no float floor
#: anywhere): 300 * 0.0025 = 0.75 deg lat, 800 * 0.0025 = 2.0 deg lon.
_CELL_LAT_I = 300
_CELL_LON_I = 800

_HAV = haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")

_SPATIAL_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             {_LAT_I} AS lat_i,
             {_LON_I} AS lon_i
      FROM customer
    ),
    p AS (
      SELECT id, {_LAT} AS lat, {_LON} AS lon,
             lat_i // {_CELL_LAT_I} AS cy,
             lon_i // {_CELL_LON_I} AS cx
      FROM pts
    ),
    offs AS (SELECT d FROM (VALUES (-1), (0), (1)) o(d)),
    cand AS (
      SELECT * FROM (
        SELECT a.id AS id, b.id AS nb, {_HAV} AS d
        FROM p a
        CROSS JOIN offs ox
        CROSS JOIN offs oy
        JOIN p b ON b.cx = a.cx + ox.d AND b.cy = a.cy + oy.d
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


@query("q_spatial_join", oracle=_SPATIAL_ORACLE)
def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join via grid blocking: for every point, how many
    others lie within SPATIAL_R_KM, and which is nearest (per-point
    rollup so the output stays n rows at any scale; the pair stream is
    the internal stage). Capability: spatial/theta join made
    shuffle-friendly -- the cross-join predicate ``haversine <= R``
    becomes a hash equi-join on an integer cell key.

    Plan: one narrow projection derives (lat, lon, cx, cy) from the
    key lattice; the LEFT side explodes to its 3x3 neighbor cells (a
    bounded x9 Generate of 5 narrow columns, never the payload); the
    join is a plain hash equi-join on (cx, cy); the self-match (d = 0)
    is kept so every point survives to the aggregate and no join-back
    pass is needed (n_within = count - 1, nearest ignores self via a
    NULL-when). Two exchanges total: the cell join and the per-id
    aggregate.

    Exactness: lattice indices and cells are pure int64 arithmetic;
    the one float derivation and the haversine predicate share their
    SQL text with the oracle, so the d <= R comparison sees
    bit-identical doubles on both engines (the q_haversine
    discipline); nearest-neighbor ties (the lattice makes equal
    distances common) break on (d, nb) in both engines.

    Scale: pair work is sum over cells of |cell| * |3x3 neighborhood|,
    bounded by cell occupancy -- with a geo hotspot, salt the cell key
    or let AQE split the skewed partition; the cell pitch is the
    recall/cost dial and the coverage inequalities in the module
    docstring are what make the blocking lossless rather than
    approximate. tests/test_spatial.py certifies grid == all-pairs at
    sf0.001 and pins both coverage margins numerically.
    """
    cust = load_table(spark, sf_dir, "customer", spread=True)
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        F.expr(_LAT_I).alias("lat_i"),
        F.expr(_LON_I).alias("lon_i"),
    ).select(
        "id",
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
        F.expr(f"lat_i div {_CELL_LAT_I}").alias("cy"),
        F.expr(f"lon_i div {_CELL_LON_I}").alias("cx"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("id").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "cx",
        "cy",
        F.explode(offs).alias("o"),
    ).select(
        "a_id",
        "a_lat",
        "a_lon",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    cand = left.join(
        pts.select(
            F.col("id").alias("nb"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            F.col("cx").alias("jx"),
            F.col("cy").alias("jy"),
        ),
        ["jx", "jy"],
    ).select(
        "a_id",
        "nb",
        haversine_km(
            F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
        ).alias("d"),
    ).filter(F.col("d") <= F.lit(SPATIAL_R_KM))
    nn = F.min(
        F.when(
            F.col("nb") != F.col("a_id"), F.struct(F.col("d"), F.col("nb"))
        )
    )
    return cand.groupBy(F.col("a_id").alias("c_custkey")).agg(
        (F.count(F.lit(1)) - F.lit(1)).alias("n_within"),
        nn.getField("nb").alias("nn_id"),
        F.round(nn.getField("d"), 3).alias("nn_dist_km"),
    )
