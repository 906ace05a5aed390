"""Vector column expressions over ARRAY<FLOAT> embeddings.

Pure Catalyst (``aggregate``/``zip_with`` higher-order functions) -- the
dot product never leaves the JVM, so brute-force similarity scans stay
inside whole-stage codegen. Accumulate in DOUBLE regardless of the input
element type so Spark and the DuckDB oracle do the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
