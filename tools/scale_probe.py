"""Measured scaling probe: how do the data-proportional operators
behave as the corpus grows 1x -> 4x -> 16x?

The sf0.1 bench is dominated by fixed per-job overhead (BASELINE.md
core-scaling row); this probe answers the question that actually
matters for the 100 TB posture -- the SLOPE. Each scale step
replicates the sf0.1 documents/embeddings tables with offset ids
(replicas are exact duplicates, which also stress-tests dedup with
worst-case duplicate families), writes them to a scratch dir, and
times a representative operator set.

    python tools/scale_probe.py [max_factor] [out_dir]

Interpretation: an operator whose time grows ~linearly (slope ~1 in
t(16x)/t(4x) ~ 4) is scan/shuffle-proportional and survives scale-up;
super-linear growth flags a pair-explosion or broadcast ceiling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"

#: Operators probed: scan/agg, narrow maps, dedup (exact + LSH), ANN,
#: chunking, quantization -- the shapes whose slope matters.
PROBE = [
    "q_dedup",
    "q_near_dedup_simhash",
    "q_knn_cosine",
    "q_ann_lsh",
    "q_chunk_docs",
    "q_quantize_embeddings",
    "q_token_tf",
    "q_mix_weights",
    "q_model_score",
    "q_contamination",
    "q_contamination_bloom",
    "q_heavy_hitters",
]


def replicate(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    for name, key in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        # events: ids offset, user_ids kept -- replication multiplies
        # per-key frequency, the right stress for the frequency sketch
        ("events", "event_id"),
    ):
        base = load_table(spark, SRC, name)
        n = base.count()
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * n)) for i in range(factor)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe"

    import __spark_entry__ as e
    from dump1090_stream_parser_spark.session import get_spark

    queries = e.queries()
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="scale_probe",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    factors = [f for f in (1, 4, 16, 64) if f <= max_factor]
    results: dict[str, dict[int, float]] = {q: {} for q in PROBE}
    for factor in factors:
        sf_dir = SRC if factor == 1 else f"{scratch}/x{factor}"
        if factor > 1:
            replicate(spark, factor, sf_dir)
        # warm the plans once per scale so slope measures data, not codegen
        for name in PROBE:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        for name in PROBE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            results[name][factor] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"factors": factors, "seconds": results}, indent=1))
    if os.path.isdir(scratch):
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
