"""Silver ingest throughput bench (BASELINE.md "ingest throughput" rows).

Synthesizes N deterministic SBS-1 MSG,3 wire lines with the gold
query's production builder, runs them through the PRODUCTION parse path
(``parse_lines`` -> ``silver``), and prints one JSON line:

    python tools/ingest_bench.py [n_rows]

Generation is INCLUDED in the measurement (same discipline as the
original round-2 number): the point is an end-to-end lower bound on
what one box pushes through the full typed Silver projection, not a
parser microbenchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dump1090_stream_parser_spark.operators.sbs1_gold import (  # noqa: E402
    sbs1_lines_from_events,
)
from dump1090_stream_parser_spark.session import get_spark  # noqa: E402
from dump1090_stream_parser_spark.sources.sbs1 import (  # noqa: E402
    parse_lines,
    silver,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="ingest_bench",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.range(n).repartition(int(cpus)).select(
        (F.col("id") % 5000).alias("user_id"),
        F.col("id").alias("event_id"),
        (
            F.lit("2026-08-13 10:00:00").cast("timestamp")
            + (F.col("id") % 86400).cast("string").cast("interval second")
        ).alias("ts"),
    )
    full = silver(
        parse_lines(
            sbs1_lines_from_events(events),
            parsed_time=F.col("generated_ts"),
        )
    )
    full.write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        full.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    sec = min(times)
    print(
        json.dumps(
            {
                "metric": "silver_ingest_rows_per_sec",
                "value": round(n / sec),
                "unit": "rows/sec",
                "n_rows": n,
                "seconds": round(sec, 3),
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
