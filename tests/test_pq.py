"""q_pq_encode: product-quantization codes over the committed codebook.

The registry parity gate already pins Spark == DuckDB on the shared
fixture; these legs pin the artifact and the quantization QUALITY:

1. fixture geometry: PQ_M x PQ_KSUB codewords of PQ_DSUB finite dims;
2. full coverage: every vector encodes in every subspace, codes in
   range, errors non-negative;
3. the trained codebook beats the 1-centroid baseline (mean subspace
   variance) on reconstruction error -- k-means actually trained;
4. plan shape: narrow and shuffle-free (no join, no exchange).
"""

from __future__ import annotations

import numpy as np

from dump1090_stream_parser_spark.operators.similarity import (
    _PQ_FIXTURE,
    PQ_DSUB,
    PQ_KSUB,
    PQ_M,
    q_pq_encode,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_pq_fixture_geometry(spark):
    rows = spark.read.parquet(_PQ_FIXTURE).collect()
    assert len(rows) == PQ_M * PQ_KSUB
    seen = {(r["m"], r["code_id"]) for r in rows}
    assert seen == {
        (m, k) for m in range(PQ_M) for k in range(PQ_KSUB)
    }
    for r in rows:
        assert len(r["cv"]) == PQ_DSUB
        assert all(np.isfinite(v) for v in r["cv"])


def test_pq_encode_covers_every_vector(spark):
    emb_ids = {
        r["vec_id"]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id")
        .collect()
    }
    rows = q_pq_encode(spark, SF_DIR).collect()
    assert len(rows) == len(emb_ids) * PQ_M
    by_vec: dict[int, set[int]] = {}
    for r in rows:
        assert 0 <= r["code_id"] < PQ_KSUB
        assert r["sq_err"] >= 0.0
        by_vec.setdefault(r["vec_id"], set()).add(r["m"])
    assert set(by_vec) == emb_ids
    assert all(ms == set(range(PQ_M)) for ms in by_vec.values())


def test_pq_beats_one_centroid_baseline(spark):
    """Mean squared error per subspace must undercut the subspace
    variance around its mean (what a K=1 codebook would score) -- the
    codebook is trained, not arbitrary."""
    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, SF_DIR, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    err = {m: [] for m in range(PQ_M)}
    for r in q_pq_encode(spark, SF_DIR).collect():
        err[r["m"]].append(r["sq_err"])
    for m in range(PQ_M):
        S = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
        baseline = ((S - S.mean(axis=0)) ** 2).sum(axis=1).mean()
        got = float(np.mean(err[m]))
        assert got < 0.9 * baseline, (m, got, baseline)


def test_pq_encode_plan_is_narrow(spark):
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    plan = formatted_plan(q_pq_encode(spark, SF_DIR))
    assert plan.count(") Exchange") == 0, plan
    assert "Join" not in plan, plan
    assert plan.count(") Generate") == 1, plan
