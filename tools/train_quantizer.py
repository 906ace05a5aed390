"""One-time fixture build: train the IVF coarse quantizer and persist
it as a centroid TABLE both engines read (VERDICT r9 ask #5).

``train_ivf_centroids`` (operators/similarity.py) runs spherical
k-means over the sf0.01 embeddings -- the driver's correctness SF --
and the result is written to ``fixtures/ivf_centroids.parquet`` as
(cell_id INT, cv DOUBLE[]) via pyarrow (one file, no Spark directory
layout, so DuckDB ``read_parquet`` and ``spark.read.parquet`` both
read it directly). The artifact is COMMITTED: training involves
distributed float sums whose task order is not deterministic, so the
fixture is trained once and pinned -- q_ann_ivf_trained and its
DuckDB oracle thereafter read identical bytes forever.

Usage: python tools/train_quantizer.py [sf_dir] [out_path]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dump1090_stream_parser_spark.operators.similarity import (
        N_CELLS,
        _seed_centroid_rows,
        quantizer_quality,
        train_ivf_centroids,
    )
    from dump1090_stream_parser_spark.session import get_spark
    from dump1090_stream_parser_spark.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/fixtures/ivf_centroids.parquet"
    )
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    seeds = [
        [float(v) for v in r["embedding"]]
        for r in _seed_centroid_rows(emb)
    ]
    q_seed = quantizer_quality(emb, seeds)
    cents = train_ivf_centroids(emb, k=N_CELLS, iters=5)
    q_trained = quantizer_quality(emb, cents)
    print(
        f"quantizer quality (mean best-cos over {sf_dir}): "
        f"seed={q_seed:.6f} trained={q_trained:.6f}"
    )

    table = pa.table(
        {
            "cell_id": pa.array(range(len(cents)), type=pa.int32()),
            "cv": pa.array(cents, type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {len(cents)} centroids -> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
