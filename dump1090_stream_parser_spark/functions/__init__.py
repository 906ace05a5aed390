"""Reusable column expressions (pure Catalyst, no UDFs in the hot path)."""

from .geo import haversine_km  # noqa: F401
from .hashing import portable_hash64, portable_unit_float  # noqa: F401
from .vector import cosine_similarity, dot  # noqa: F401
