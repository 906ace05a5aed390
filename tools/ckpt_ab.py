"""A/B a set of queries with localCheckpoint enabled vs no-op'd:
per-query min-of-3 noop-sink seconds plus executed shuffle-record
totals, to decide which lazy checkpoints are load-bearing (lineage
re-run guards) and which are pure overhead (ReuseExchange already
covers the fan-out).

Usage: python tools/ckpt_ab.py q_a q_b ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dump1090_stream_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from dump1090_stream_parser_spark.plans.metrics import (
        executed_stage_signature,
    )

    queries = entry_mod.queries()
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="ckpt_ab",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries["q_group_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    from pyspark.sql import DataFrame

    orig = DataFrame.localCheckpoint

    def run(name):
        fn = queries[name]
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        sig = executed_stage_signature(spark, lambda: fn(spark, sf_dir))
        return min(reps), sig["shuffle_records"], sig["n_stages"]

    for name in names:
        DataFrame.localCheckpoint = orig
        t_on, rec_on, st_on = run(name)
        DataFrame.localCheckpoint = lambda self, eager=True: self
        t_off, rec_off, st_off = run(name)
        DataFrame.localCheckpoint = orig
        verdict = "SAME-RECORDS" if rec_on == rec_off else "RECORDS-DIFFER"
        print(
            f"{name}: on {t_on:.3f}s/{rec_on}rec/{st_on}st"
            f" | off {t_off:.3f}s/{rec_off}rec/{st_off}st  [{verdict}]"
        )

    spark.stop()


if __name__ == "__main__":
    main()
