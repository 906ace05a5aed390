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

    from dump1090_stream_parser_spark.plans.inspect import (
        spread_exchange_count,
    )

    plan = formatted_plan(q_pq_encode(spark, SF_DIR))
    # zero KEYED exchanges; the conditional scan_spread round-robin
    # (absent at production split counts) is counted separately
    assert plan.count(") Exchange") - spread_exchange_count(plan) == 0, plan
    assert "Join" not in plan, plan
    assert plan.count(") Generate") == 1, plan


def test_opq_rotation_is_orthonormal(spark):
    """The committed OPQ rotation must be orthonormal (R^T R = I): the
    Procrustes solve guarantees it at training time; this pins the
    ARTIFACT so a corrupted fixture cannot silently turn 'rotation'
    into an arbitrary linear map (which would break the
    distance-preservation argument OPQ rests on)."""
    from dump1090_stream_parser_spark.operators.similarity import (
        _OPQ_ROT_FIXTURE,
    )

    rows = sorted(
        spark.read.parquet(_OPQ_ROT_FIXTURE).collect(),
        key=lambda r: r["out_dim"],
    )
    d = PQ_M * PQ_DSUB
    assert len(rows) == d
    R = np.array([r["rv"] for r in rows], dtype=np.float64).T
    assert np.abs(R.T @ R - np.eye(d)).max() < 1e-9


def test_opq_improves_reconstruction_on_training_sf(spark):
    """On the TRAINING corpus (sf0.01 -- the fixture-provenance SF)
    the trained rotation must beat plain PQ on total squared
    reconstruction error at identical storage: this proves the
    alternating Procrustes optimization actually optimized. Measured
    0.714 -> 0.629 mean (-11.9%); the gate asserts >= 5%.

    Deliberately NOT asserted on held-out SFs: the synthetic
    embeddings are measured near-isotropic (rotation-invariant), so
    the train-set gain does not generalize here -- the honest negative
    recorded in similarity.py's OPQ block and docs/SCALE.md. On a real
    anisotropic corpus this test's held-out twin would be the gate."""
    from dump1090_stream_parser_spark.operators.similarity import (
        q_opq_encode,
    )

    train_sf = "/root/testdata/sf0.01"
    plain = sum(
        r["sq_err"] for r in q_pq_encode(spark, train_sf).collect()
    )
    opq = sum(
        r["sq_err"] for r in q_opq_encode(spark, train_sf).collect()
    )
    assert opq < 0.95 * plain, (plain, opq)


def test_opq_encode_covers_and_stays_narrow(spark):
    """Same coverage + plan contract as q_pq_encode: every vector
    encodes in every subspace, and the whole encode stays shuffle-free
    on the corpus side. Since round 13 the rotation matrix rides as
    DATA (a one-row broadcast local relation -- killing the
    per-action analyzer walks over a 4096-literal tree, the r12 watch
    item), so the pinned shape is: zero shuffle Exchange, exactly one
    BroadcastNestedLoopJoin fed by a 1-row BroadcastExchange over a
    local scan (never the corpus), exactly one Generate."""
    from dump1090_stream_parser_spark.operators.similarity import (
        q_opq_encode,
    )
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    emb_ids = {
        r["vec_id"]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id")
        .collect()
    }
    rows = q_opq_encode(spark, SF_DIR).collect()
    assert len(rows) == len(emb_ids) * PQ_M
    assert all(0 <= r["code_id"] < PQ_KSUB for r in rows)
    assert all(r["sq_err"] >= 0.0 for r in rows)

    from dump1090_stream_parser_spark.plans.inspect import (
        spread_exchange_count,
    )

    plan = formatted_plan(q_opq_encode(spark, SF_DIR))
    # no KEYED shuffle anywhere: the only exchanges are the 1-row
    # broadcast of the rotation matrix and (locally) the conditional
    # scan_spread round-robin, absent at production split counts
    assert plan.count(") Exchange") - spread_exchange_count(plan) == 0, plan
    assert plan.count(") BroadcastExchange") == 1, plan
    assert plan.count(") BroadcastNestedLoopJoin") == 1, plan
    # the broadcast side is the local rotation relation, not a corpus
    # scan (a broadcast of parquet would name the file source)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count(") Generate") == 1, plan


def test_ann_pq_recall_vs_exact_and_shape(spark):
    """q_ann_pq quality + contract: (1) exactly ANN_JOIN_K ranked rows
    per query with rn dense from 1; (2) the re-rank leg's ip is the
    true inner product (numpy-checked within fp tolerance); (3) mean
    recall@k against exact full-scan inner-product search clears a
    floor ~2x the random-shortlist baseline (PQ_SHORTLIST/corpus ~13%
    at this SF, so random recall ~0.13; the corpus is near-uniform,
    the hardest ANN regime)."""
    from dump1090_stream_parser_spark.operators.similarity import (
        ANN_JOIN_K,
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        q_ann_pq,
    )

    rows = q_ann_pq(spark, SF_DIR).collect()
    emb = sorted(
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    qmask = (ids >= ANN_JOIN_Q_LO) & (ids <= ANN_JOIN_Q_HI)
    QI, Q = ids[qmask], X[qmask]
    CI, C = ids[~qmask], X[~qmask]
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(QI.tolist())
    recalls = []
    for qi, qv in zip(QI, Q):
        got = sorted(by_q[qi], key=lambda r: r["rn"])
        assert [r["rn"] for r in got] == list(range(1, ANN_JOIN_K + 1))
        ip = C @ qv
        lookup = dict(zip(CI.tolist(), ip))
        for r in got:
            assert abs(r["ip"] - lookup[r["vec_id"]]) < 1e-5, r
        exact = set(CI[np.argsort(-ip, kind="stable")][:ANN_JOIN_K])
        recalls.append(
            len(exact & {r["vec_id"] for r in got}) / ANN_JOIN_K
        )
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_ann_opq_recall_and_rotation_invariance(spark):
    """q_ann_opq contract: (1) the same ranked-output shape as
    q_ann_pq (ANN_JOIN_K dense rows per query); (2) the re-rank ip is
    the TRUE inner product on the ORIGINAL vectors -- the orthonormal
    rotation must not leak into the exact leg; (3) mean recall@k
    clears the same floor as q_ann_pq (on this near-isotropic corpus
    the honest expectation is parity, not superiority -- docs/SCALE.md
    opqsweep)."""
    from dump1090_stream_parser_spark.operators.similarity import (
        ANN_JOIN_K,
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        q_ann_opq,
    )

    rows = q_ann_opq(spark, SF_DIR).collect()
    emb = sorted(
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    qmask = (ids >= ANN_JOIN_Q_LO) & (ids <= ANN_JOIN_Q_HI)
    QI, Q = ids[qmask], X[qmask]
    CI, C = ids[~qmask], X[~qmask]
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(QI.tolist())
    recalls = []
    for qi, qv in zip(QI, Q):
        got = sorted(by_q[qi], key=lambda r: r["rn"])
        assert [r["rn"] for r in got] == list(range(1, ANN_JOIN_K + 1))
        ip = C @ qv
        lookup = dict(zip(CI.tolist(), ip))
        for r in got:
            assert abs(r["ip"] - lookup[r["vec_id"]]) < 1e-5, r
        exact = set(CI[np.argsort(-ip, kind="stable")][:ANN_JOIN_K])
        recalls.append(
            len(exact & {r["vec_id"] for r in got}) / ANN_JOIN_K
        )
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_pq_codes_layout_row_exact_and_small(spark, tmp_path):
    """The at-rest codes table: (1) search over it is ROW-EXACT vs
    the on-the-fly q_ann_pq; (2) its scan schema carries no embedding
    column (the 64x read saving is real, not asserted); (3) the codes
    parquet is a small fraction of the embeddings parquet on disk."""
    import os

    from dump1090_stream_parser_spark.plans.inspect import (
        formatted_plan,
    )
    from dump1090_stream_parser_spark.plans.layout import (
        ann_pq_over_layout,
        pq_codes_layout,
    )
    from dump1090_stream_parser_spark.operators.similarity import (
        q_ann_pq,
    )

    codes_dir = str(tmp_path / "pq_codes")
    pq_codes_layout(spark, SF_DIR, codes_dir)
    got = ann_pq_over_layout(spark, codes_dir, SF_DIR)
    expect = sorted(
        map(tuple, q_ann_pq(spark, SF_DIR).collect())
    )
    assert sorted(map(tuple, got.collect())) == expect

    plan = formatted_plan(got)
    code_scans = [
        blk
        for blk in plan.split("\n\n")
        if "pq_codes" in blk and "ReadSchema" in blk
    ]
    assert code_scans, plan
    for blk in code_scans:
        schema = [
            ln for ln in blk.splitlines() if ln.startswith("ReadSchema")
        ]
        assert schema and "embedding" not in schema[0], blk

    def tree_bytes(d):
        if os.path.isfile(d):
            return os.path.getsize(d)
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    emb_bytes = tree_bytes(f"{SF_DIR}/embeddings.parquet")
    code_bytes = tree_bytes(codes_dir)
    assert code_bytes < 0.25 * emb_bytes, (code_bytes, emb_bytes)


def test_pq_ivf_composed_index_prunes_and_reranks(spark, tmp_path):
    """The composed production ANN index (IVF directories x PQ codes):
    (1) the probe's codes scan carries cell_id PartitionFilters (file-
    listing-time pruning) and an embedding-free ReadSchema; (2) every
    result comes from a probed cell; (3) the re-rank ip is the true
    inner product; (4) k rows, ip-descending."""
    import numpy as np

    from dump1090_stream_parser_spark.operators.similarity import (
        QUERY_VEC_ID,
    )
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan
    from dump1090_stream_parser_spark.plans.layout import (
        ann_pq_probe_pruned,
        pq_ivf_codes_layout,
    )

    out = str(tmp_path / "pq_by_cell")
    pq_ivf_codes_layout(spark, SF_DIR, out, centroids="trained")
    probe = ann_pq_probe_pruned(
        spark, out, SF_DIR, QUERY_VEC_ID, k=3, centroids="trained"
    )

    plan = formatted_plan(probe)
    code_scans = [
        blk
        for blk in plan.split("\n\n")
        if "pq_by_cell" in blk and "ReadSchema" in blk
    ]
    assert code_scans, plan
    for blk in code_scans:
        assert any(
            "PartitionFilters" in ln and "cell_id" in ln
            for ln in blk.splitlines()
        ), blk
        schema = [
            ln for ln in blk.splitlines() if ln.startswith("ReadSchema")
        ]
        assert schema and "embedding" not in schema[0], blk

    rows = probe.collect()
    assert len(rows) == 3
    ips = [r["ip"] for r in rows]
    assert ips == sorted(ips, reverse=True)

    emb = sorted(
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], float) for r in emb}
    qv = vecs[QUERY_VEC_ID]
    for r in rows:
        assert r["vec_id"] != QUERY_VEC_ID
        assert abs(r["ip"] - float(vecs[r["vec_id"]] @ qv)) < 1e-5


def test_q_ann_pq_pruned_partition_filters_and_results(spark):
    """The REGISTERED composed-index read path (q_ann_pq_pruned,
    VERDICT r10 ask #6): (1) the codes scan over the written
    cell_id=N/ layout carries cell_id PartitionFilters and an
    embedding-free ReadSchema; (2) every result row's cell is one of
    ITS query's probed cells; (3) <= ANN_JOIN_K rows per query,
    ip-descending; (4) ip is the true inner product."""
    import numpy as np

    from dump1090_stream_parser_spark.operators.similarity import (
        ANN_JOIN_K,
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        IVF_NPROBE,
        _IVF_FIXTURE,
        _cos_py,
        q_ann_pq_pruned,
    )
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    df = q_ann_pq_pruned(spark, SF_DIR)

    plan = formatted_plan(df)
    code_scans = [
        blk
        for blk in plan.split("\n\n")
        if "pq_ivf_codes" in blk and "ReadSchema" in blk
    ]
    assert code_scans, plan
    for blk in code_scans:
        assert any(
            "PartitionFilters" in ln and "cell_id" in ln
            for ln in blk.splitlines()
        ), blk
        schema = [
            ln for ln in blk.splitlines() if ln.startswith("ReadSchema")
        ]
        assert schema and "embedding" not in schema[0], blk

    rows = df.collect()
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], float) for r in emb}
    cents = sorted(
        spark.read.parquet(_IVF_FIXTURE).collect(),
        key=lambda r: r["cell_id"],
    )
    probed = {}
    for qid in range(ANN_JOIN_Q_LO, ANN_JOIN_Q_HI + 1):
        qv = [float(v) for v in vecs[qid]]
        probed[qid] = {
            cid
            for cid, _ in sorted(
                (
                    (int(c["cell_id"]),
                     round(_cos_py(qv, [float(v) for v in c["cv"]]), 6))
                    for c in cents
                ),
                key=lambda t: (-t[1], t[0]),
            )[:IVF_NPROBE]
        }
    by_q = {}
    for r in rows:
        assert r["cell_id"] in probed[r["query_id"]], r
        assert not (ANN_JOIN_Q_LO <= r["vec_id"] <= ANN_JOIN_Q_HI)
        ip_true = float(vecs[r["vec_id"]] @ vecs[r["query_id"]])
        assert abs(r["ip"] - ip_true) < 1e-5, r
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(ANN_JOIN_Q_LO, ANN_JOIN_Q_HI + 1))
    for qid, rs in by_q.items():
        assert len(rs) <= ANN_JOIN_K
        ips = [r["ip"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert ips == sorted(ips, reverse=True), (qid, ips)
