from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from dump1090_stream_parser_spark.session import get_spark

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
            # launch (DataSource V2 lookup; addJar cannot extend it)
            "spark.jars": "/root/repo/java/sbs1-jvm-source.jar",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    from dump1090_stream_parser_spark.testing import duckdb_oracle

    con = duckdb_oracle(SF_DIR)
    yield con
    con.close()
