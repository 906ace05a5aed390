"""Testdata table loaders.

The driver generates a TPC-H-ish star schema plus ``events`` (stream
stand-in), ``documents`` and ``embeddings`` at /root/testdata/sf* (see
TESTDATA.md / FIXTURES.md §2). These loaders are the single place that
knows two quirks:

- ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a long
  (with ``spark.sql.legacy.parquet.nanosAsLong=true``) and we convert to
  a microsecond TIMESTAMP_NTZ with integer division -- the same
  truncation DuckDB applies on read, so oracle comparisons line up.
- All other timestamps load as TIMESTAMP_NTZ already, matching DuckDB's
  naive TIMESTAMP.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_conf

#: Tables the driver pre-registers as DuckDB views (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with normalized types."""
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch -> µs TIMESTAMP_NTZ; `div` truncates exactly like DuckDB.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
