from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from dump1090_stream_parser_spark.session import get_spark
from dump1090_stream_parser_spark.sources.sbs1_jvm import jvm_source_conf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        master="local[4]",
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "1MB",
            # the stage-level shuffle meter (plans/metrics.py) reads the
            # UI REST status store; get_spark disables the UI by default
            "spark.ui.enabled": "true",
            # the sbs1-jvm source class must be on the classpath at JVM
            # launch (DataSource V2 lookup; addJar cannot extend it);
            # resolved relative to the package so non-/root checkouts
            # work, rebuilt from source if the jar is missing
            **jvm_source_conf(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _no_leaked_streams(request):
    """A streaming query that outlives its test (awaitTermination
    timing out under a slow-box epoch, a stop() skipped on an assert
    path) keeps completing micro-batch stages CONCURRENTLY with later
    tests -- which polluted an executed-stage pin and starved a
    thread-stress test in the round-12 full-suite run. Stop stragglers
    at test teardown and say which test leaked them."""
    yield
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    if session is None:
        return
    for sq in session.streams.active:
        print(
            f"WARNING: {request.node.nodeid} leaked streaming query"
            f" {sq.name or sq.id}; stopping it"
        )
        try:
            sq.stop()
        except Exception:
            pass


@pytest.fixture(scope="session")
def oracle():
    from dump1090_stream_parser_spark.testing import duckdb_oracle

    con = duckdb_oracle(SF_DIR)
    yield con
    con.close()
