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

``pq`` mode trains the PRODUCT-QUANTIZATION codebook the same way:
per-subspace Lloyd's k-means (numpy, float64, deterministic first-K
-distinct init, fixed iteration count) over the sf0.01 embeddings --
training is sample-sized by design (a 100 TB deployment trains on a
uniform sample; encoding stays full-scale and narrow) -- written to
``fixtures/pq_codebook.parquet`` as (m INT, code_id INT, cv DOUBLE[])
and COMMITTED so q_pq_encode and its oracle read identical bytes.

Usage: python tools/train_quantizer.py [sf_dir] [out_path]
       python tools/train_quantizer.py pq [sf_dir] [out_path]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def train_pq(sf_dir: str, out: str) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dump1090_stream_parser_spark.operators.similarity import (
        PQ_DSUB,
        PQ_KSUB,
        PQ_M,
    )
    from dump1090_stream_parser_spark.session import get_spark
    from dump1090_stream_parser_spark.tables import load_table

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rows = sorted(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    spark.stop()

    ms, codes, cvs = [], [], []
    for m in range(PQ_M):
        S = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
        # deterministic init: first PQ_KSUB DISTINCT subvectors in
        # vec_id order (duplicates would seed dead twin cells)
        seen: list[tuple] = []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.append(t)
            if len(seen) == PQ_KSUB:
                break
        C = np.array(seen, dtype=np.float64)
        for _ in range(10):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest code id
            for k in range(PQ_KSUB):
                mask = assign == k
                if mask.any():
                    C[k] = S[mask].mean(axis=0)
        d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        err = d2.min(axis=1).mean()
        base = ((S - S.mean(axis=0)) ** 2).sum(axis=1).mean()
        print(
            f"subspace {m}: mean sq_err {err:.6f}"
            f" vs 1-centroid baseline {base:.6f}"
        )
        for k in range(PQ_KSUB):
            ms.append(m)
            codes.append(k)
            cvs.append([float(v) for v in C[k]])

    table = pa.table(
        {
            "m": pa.array(ms, type=pa.int32()),
            "code_id": pa.array(codes, type=pa.int32()),
            "cv": pa.array(cvs, type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {len(ms)} codewords -> {out}")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "pq":
        return train_pq(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            sys.argv[3]
            if len(sys.argv) > 3
            else "/root/repo/fixtures/pq_codebook.parquet",
        )
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
