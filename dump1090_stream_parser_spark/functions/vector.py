"""Vector column expressions over ARRAY<FLOAT> embeddings.

Pure Catalyst (``aggregate``/``zip_with`` higher-order functions) --
the dot product never leaves the JVM. Spark's higher-order functions
are CodegenFallback (the lambda evaluates interpreted, per row), so on
pair-scale inputs (near-dup verify joins) the fold is the per-row
cost that matters. Two measured facts steer how these are used
(round 5, 810k-pair verify join at sf0.1):

- Hoisting the per-VECTOR ``norm`` out of the per-PAIR expression
  (compute on the n-row join sides, carry as a column) cut the
  end-to-end line ~20% -- same doubles bit-for-bit, the norm is the
  same stored value either way.
- Unrolling the dot into a flat 64-term ``a[0]*b[0] + ...`` expression
  (same left-to-right accumulation order, bit-identical result) made
  it 3.5x SLOWER: the giant expression kicked the whole stage out of
  WholeStageCodegen (0 spans), and interpreted evaluation of a
  64-node Add tree loses to ArrayAggregate's tight interpreted loop.
  Don't "optimize" the fold away; shrink how often it runs.

Accumulate in DOUBLE regardless of the input element type so Spark and
the DuckDB oracle do the same arithmetic.
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
