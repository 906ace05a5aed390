"""Geospatial column expressions.

The reference's users compute great-circle distance over ``squitters``
lat/lon by hand-rolling haversine in SQLite SQL (SURVEY.md §2.2 "Math
fns"). Here it is a composed Catalyst expression -- JVM-side,
whole-stage-codegen-able, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: IUGG mean Earth radius, km.
EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) points in degrees."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL (for DuckDB oracle parity)."""
    dlat = f"radians(({lat2}) - ({lat1}))"
    dlon = f"radians(({lon2}) - ({lon1}))"
    a = (
        f"sin({dlat}/2) * sin({dlat}/2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"sin({dlon}/2) * sin({dlon}/2)"
    )
    return f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt({a}))"
