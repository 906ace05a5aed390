"""Accuracy gates the DuckDB oracle cannot express: bounded-error
contracts for sketches (whose registered queries are self-certifying
full-oracle since round 6 -- these tests independently recompute the
exact side), ANN recall floors, quantization error bounds, and
eigensolver agreement with numpy."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.relational import (
    q_approx_distinct,
    q_distinct_aircraft,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_approx_distinct_self_certifies(spark):
    """The self-certifying shape (VERDICT r5 #1): exact counts match an
    independent computation and every group's HLL estimate sits inside
    the exported bounded-error envelope."""
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = q_approx_distinct(spark, SF_DIR).collect()
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r["n_users"] == exact[k], (k, r["n_users"], exact[k])
        assert r["hll_within_bounds"] is True, k


def test_approx_and_exact_total_agree(spark):
    total_exact = q_distinct_aircraft(spark, SF_DIR).collect()[0]["n_users"]
    est = (
        load_table(spark, SF_DIR, "events")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - total_exact) <= max(0.10 * total_exact, 2)


def test_approx_percentile_self_certifies(spark):
    """The self-certifying shape (VERDICT r5 #1): exact discrete
    percentiles match a driver-side recomputation over sorted values,
    and the GK sketch's within-bounds booleans hold for every group."""
    from dump1090_stream_parser_spark.operators.relational import (
        q_approx_percentile,
    )

    vals: dict[str, list[int]] = {}
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity")
        .collect()
    ):
        vals.setdefault(r["l_returnflag"], []).append(
            int(round(r["l_quantity"] * 100))
        )

    def disc(sorted_vals: list[int], num: int, den: int) -> int:
        # smallest value whose cumulative count reaches ceil(q*n)
        rank = (num * len(sorted_vals) + den - 1) // den
        return sorted_vals[max(rank, 1) - 1]

    rows = {r["l_returnflag"]: r for r in
            q_approx_percentile(spark, SF_DIR).collect()}
    assert set(rows) == set(vals)
    for flag, xs in vals.items():
        xs.sort()
        r = rows[flag]
        assert r["n_items"] == len(xs)
        assert r["p50_cents"] == disc(xs, 1, 2), flag
        assert r["p90_cents"] == disc(xs, 9, 10), flag
        assert r["p50_within_bounds"] is True, flag
        assert r["p90_within_bounds"] is True, flag


def test_ann_recall_vs_brute_force(spark):
    """Quality gate for the ANN paths beyond oracle equality: the oracle
    proves the probe was executed faithfully, this proves the probe is
    WORTH executing. Ground truth = brute-force top-10 (recall 1.0 by
    construction). The corpus embeddings are near-uniform (top cosine
    ~0.37), the hardest regime for ANN, so the floors are modest but
    real: multi-probe LSH (hamming<=2, 14% scan) and IVF (nprobe=2,
    ~25% scan) must both beat random candidate selection by a wide
    margin (random 14% scan would recall ~0.14)."""
    from dump1090_stream_parser_spark.operators.similarity import (
        q_ann_ivf,
        q_ann_lsh,
        q_knn_cosine,
    )

    brute = [r["vec_id"] for r in q_knn_cosine(spark, SF_DIR).collect()][:10]
    truth = set(brute)
    ivf = {r["vec_id"] for r in q_ann_ivf(spark, SF_DIR).collect()}
    lsh = {r["vec_id"] for r in q_ann_lsh(spark, SF_DIR).collect()}
    assert len(truth) == 10
    assert len(ivf & truth) / 10 >= 0.5, sorted(ivf & truth)
    assert len(lsh & truth) / 10 >= 0.3, sorted(lsh & truth)


def test_dedup_clusters_agree_with_pair_graph(spark):
    """Cluster assignment must be exactly the transitive closure of the
    verified near-dup pairs: pair members share a cluster, cluster_id is
    the component minimum, and sizes partition the corpus."""
    from dump1090_stream_parser_spark.operators.dedup import (
        q_dedup_clusters,
        q_near_dedup_ngram,
    )

    clusters = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in q_dedup_clusters(spark, SF_DIR).collect()
    }
    pairs = [
        (r.doc_id_1, r.doc_id_2)
        for r in q_near_dedup_ngram(spark, SF_DIR).collect()
    ]
    for a, b in pairs:
        assert clusters[a][0] == clusters[b][0], (a, b)
    # cluster_id is the min member; sizes are consistent and partition
    # the document set
    from collections import Counter

    members = Counter(cid for cid, _ in clusters.values())
    for doc_id, (cid, size) in clusters.items():
        assert cid <= doc_id
        assert members[cid] == size
    assert sum(members.values()) == len(clusters)


def test_dedup_clusters_lsh_closes_survivor_graph(spark):
    """The scale composition (CC over MinHash+LSH survivor edges) must
    be exactly the transitive closure of q_near_dedup_minhash's verified
    pairs: same invariants as the exact variant, but over the edge set a
    100 TB pipeline would actually build."""
    from collections import Counter

    from dump1090_stream_parser_spark.operators.dedup import (
        q_dedup_clusters_lsh,
        q_near_dedup_minhash,
    )

    clusters = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in q_dedup_clusters_lsh(spark, SF_DIR).collect()
    }
    pairs = [
        (r.doc_id_1, r.doc_id_2)
        for r in q_near_dedup_minhash(spark, SF_DIR).collect()
    ]
    assert pairs, "fixture corpus must contain minhash survivors"
    for a, b in pairs:
        assert clusters[a][0] == clusters[b][0], (a, b)
    members = Counter(cid for cid, _ in clusters.values())
    for doc_id, (cid, size) in clusters.items():
        assert cid <= doc_id
        assert members[cid] == size
    assert sum(members.values()) == len(clusters)


def test_quantize_error_mathematically_bounded(spark):
    """int8 symmetric quantization guarantees |reconstructed - x| <=
    scale/2 per element (round-to-nearest of x/scale). Recompute the
    per-vector bound in numpy and assert the operator's reported
    errors respect it -- a mathematical property the oracle's
    mirror-equality can't express."""
    import numpy as np

    from dump1090_stream_parser_spark.operators.similarity import (
        QUANT_NANO,
        q_quantize_embeddings,
    )

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    max_scale = 0.0
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        am = float(np.max(np.abs(v))) if len(v) else 0.0
        scale = 1.0 if am == 0 else am / 127.0
        max_scale = max(max_scale, scale)
        q = np.floor(v / scale + 0.5)
        err = np.abs(q * scale - v)
        assert float(err.max()) <= scale / 2 * (1 + 1e-9) + 1e-12

    out = q_quantize_embeddings(spark, SF_DIR).collect()
    assert out
    for row in out:
        # reported max error can't exceed the worst admissible bound
        assert row.max_abs_err <= max_scale / 2 + 1.0 / QUANT_NANO
        assert 0.0 <= row.avg_abs_err <= row.max_abs_err


def test_chunk_docs_covers_every_token_exactly(spark):
    """Chunking invariants, independent of the oracle mirror: chunks
    tile the document with stride coverage (every token lands in >= 1
    chunk), overlap accounting holds (sum of chunk sizes = n +
    overlap*(n_chunks-1)), and the final chunk is never empty."""
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.text import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        q_chunk_docs,
    )
    from dump1090_stream_parser_spark.operators.text import (
        _CHUNK_STRIDE as STRIDE,
    )

    doc_tokens = {
        r.doc_id: len([t for t in r.text.split(" ") if t])
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    chunks = defaultdict(list)
    for r in q_chunk_docs(spark, SF_DIR).collect():
        chunks[r.doc_id].append((r.chunk_idx, r.n_tokens))

    assert set(chunks) == set(doc_tokens)
    for doc_id, cs in chunks.items():
        n = doc_tokens[doc_id]
        cs.sort()
        idxs = [i for i, _ in cs]
        assert idxs == list(range(len(cs)))  # dense chunk indices
        sizes = [s for _, s in cs]
        assert all(1 <= s <= CHUNK_TOKENS for s in sizes)
        # coverage: chunk i spans [i*STRIDE, i*STRIDE + size); the last
        # chunk must reach the end of the document
        last_idx, last_size = cs[-1]
        assert last_idx * STRIDE + last_size == n
        # all but the last chunk are full-width
        assert all(s == CHUNK_TOKENS for s in sizes[:-1])
        # overlap accounting
        assert sum(sizes) == n + CHUNK_OVERLAP * (len(cs) - 1) or len(cs) == 1


def test_ivf_training_improves_quantizer(spark):
    """Lloyd's iterations must not worsen the spherical-k-means
    objective (mean best-cosine to the centroid set), and should
    strictly improve it over the raw seed centroids on this corpus."""
    from dump1090_stream_parser_spark.operators.similarity import (
        quantizer_quality,
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = train_ivf_centroids(emb, iters=0)
    trained = train_ivf_centroids(emb, iters=4)
    q0 = quantizer_quality(emb, seeds)
    q4 = quantizer_quality(emb, trained)
    assert q4 > q0, (q0, q4)


def test_heavy_hitters_mg_bounds_under_truncation(spark):
    """Force the Misra-Gries decrement path (capacity far below the
    key cardinality) and pin the mergeable-summary guarantees against
    exact counts: est <= true <= est + E for every reported key, and
    no key whose true count exceeds E is missing from the summary."""
    from dump1090_stream_parser_spark.operators.pipeline_ops import (
        heavy_hitters,
        heavy_hitters_summary,
    )

    ev = load_table(spark, SF_DIR, "events").repartition(8)
    cap = 8  # events has ~dozens of distinct user_ids -> truncation

    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }

    summ = heavy_hitters_summary(ev, "user_id", cap)
    E = (
        summ.agg(F.sum("dec").alias("e")).collect()[0]["e"] or 0
    )
    assert E > 0, "capacity must force truncation for this test"

    top = heavy_hitters(ev, "user_id", k=5, cap=cap).collect()
    assert len(top) == 5
    for r in top:
        true = exact[r["user_id"]]
        assert r["est_count"] <= true <= r["count_ub"], (
            r["user_id"], r["est_count"], true, r["count_ub"],
        )
        assert r["count_ub"] == r["est_count"] + E

    reported = {
        r["user_id"]
        for r in summ.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .collect()
    }
    for uid, true in exact.items():
        if true > E:
            assert uid in reported, (uid, true, E)


def test_label_pca_aligns_with_numpy_eigh(spark):
    """Power iteration per label (applyInPandas) must agree with
    numpy's dense eigendecomposition on the same data: top-eigenvector
    alignment |cos| ~ 1 and matching variance share."""
    import numpy as np

    from dump1090_stream_parser_spark.operators.inference import label_pca
    from dump1090_stream_parser_spark.operators.inference import _label_pca
    import pandas as pd

    got = {
        r["label"]: r
        for r in label_pca(
            load_table(spark, SF_DIR, "embeddings")
        ).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(list(r["embedding"]))

    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        X = np.array(vecs, dtype="float64")
        Xc = X - X.mean(axis=0)
        cov = Xc.T @ Xc / max(len(X) - 1, 1)
        w, V = np.linalg.eigh(cov)
        v_np, lam_np = V[:, -1], w[-1]
        r = got[label]
        assert r["n_vecs"] == len(vecs)
        ref_ratio = lam_np / np.trace(cov)
        assert abs(r["var_explained"] - ref_ratio) < 1e-6, (
            label, r["var_explained"], ref_ratio,
        )
        # reconstruct the operator's vector to compare directions
        pdf = pd.DataFrame(
            {"label": [label] * len(vecs), "embedding": vecs}
        )
        full = _label_pca(pdf)
        assert full["top_dim"].iloc[0] == r["top_dim"]
        assert int(np.argmax(np.abs(v_np))) == r["top_dim"]
        assert abs(abs(v_np[r["top_dim"]]) - abs(r["top_loading"])) < 1e-6


def test_embedding_lsh_near_dup_recall_vs_brute_force(spark):
    """Quality gate for the banded-LSH near-dup blocking beyond oracle
    equality (which only proves Spark and DuckDB draw the same buckets):
    against brute-force all-pairs ground truth the banding must (a) emit
    ONLY true pairs -- the verify join recomputes exact cosine, so
    precision is 1.0 by construction, asserted anyway -- and (b) recover
    a real fraction of them. At this corpus's weak 0.4-cosine threshold
    (theta ~ 66 deg, per-plane agreement ~0.63) the R=4/B=8 banding
    predicts 1-(1-0.63^4)^8 ~ 0.75 recall at the boundary; the
    deterministic draw measures 44/66 = 0.667. Floor at 0.6."""
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.functions.vector import (
        cosine_similarity,
    )
    from dump1090_stream_parser_spark.operators.similarity import (
        EMB_NEAR_DUP_THRESHOLD,
        q_near_dedup_embedding_lsh,
    )
    from dump1090_stream_parser_spark.tables import load_table

    lsh = {
        (r.vec_id_1, r.vec_id_2)
        for r in q_near_dedup_embedding_lsh(spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    truth = {
        (r.v1, r.v2)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            F.round(
                cosine_similarity(
                    F.col("a.embedding"), F.col("b.embedding")
                ),
                6,
            ).alias("c"),
        )
        .filter(F.col("c") >= EMB_NEAR_DUP_THRESHOLD)
        .collect()
    }
    assert lsh <= truth  # precision 1.0 (verify pass)
    assert len(truth) > 0
    assert len(lsh & truth) / len(truth) >= 0.6


def test_dedup_incremental_partitions_the_snapshot(spark):
    """Snapshot-diff classes must partition the current crawl exactly,
    and every class must be non-empty at this SF -- if testdata drift
    ever emptied one (e.g. the synthesized copied-content docs), the
    oracle would still hash-match while certifying a degenerate
    classifier."""
    from dump1090_stream_parser_spark.operators.dedup import (
        _SNAP_CUR_SQL,
        q_dedup_incremental,
    )

    rows = {r["status"]: r for r in
            q_dedup_incremental(spark, SF_DIR).collect()}
    assert set(rows) == {
        "carried", "changed", "new_duplicate", "new_unique"
    }
    for status, r in rows.items():
        assert r["n_docs"] > 0, status
    n_cur = (
        load_table(spark, SF_DIR, "documents")
        .filter(_SNAP_CUR_SQL)
        .count()
    )
    assert sum(r["n_docs"] for r in rows.values()) == n_cur


def test_lm_score_probability_invariants(spark):
    """Corpus-LM scores are probabilities in fixed point: every
    exported avg is in (0, 1e9] (a bigram always has c12 >= 1 of its
    own occurrence, so probabilities are never 0; conditionals never
    exceed 1), and the per-doc bigram count equals token_count - 1
    recomputed from the raw text."""
    from dump1090_stream_parser_spark.operators.text import (
        LM_PROB_SCALE,
        q_lm_score,
    )

    rows = q_lm_score(spark, SF_DIR).collect()
    assert rows
    tokens = {
        r["doc_id"]: len([t for t in r["text"].split(" ") if t])
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    for r in rows:
        assert 0 < r["avg_prob_nano"] <= LM_PROB_SCALE, r
        assert r["n_bigrams"] == tokens[r["doc_id"]] - 1, r


def test_containment_planted_recall_and_asymmetry(spark):
    """Containment ground truth: every synthesized aggregation page
    contains its base doc (recall floor 0.95 at the test SF), and the
    relation is ASYMMETRIC -- the container (base + equal-sized filler)
    must NOT be reported as contained in its base, the property that
    distinguishes this operator from the symmetric near-dup tier."""
    from dump1090_stream_parser_spark.operators.text import (
        _CONTAIN_SRC_SQL,
        contain_container_id,
        q_containment,
    )

    pairs = {
        (r.contained_doc_id, r.container_doc_id)
        for r in q_containment(spark, SF_DIR).collect()
    }
    bases = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .filter(_CONTAIN_SRC_SQL)
        .select("doc_id")
        .collect()
    ]
    assert bases
    found = sum(
        1 for b in bases if (b, contain_container_id(b)) in pairs
    )
    assert found / len(bases) >= 0.95, (found, len(bases))
    # asymmetry: container -> base never passes the 70% bar
    reversed_hits = [
        b for b in bases if (contain_container_id(b), b) in pairs
    ]
    assert not reversed_hits, reversed_hits


def test_semantic_dedup_matches_numpy_reference(spark):
    """Third-engine gate for the SemDeDup manifest (oracle equality only
    proves Spark and DuckDB agree; this recomputes the whole policy in
    numpy): identical dropped set, identical keeper attribution, and the
    policy invariants (keeper has a lower id, shares the cell, and is
    the dropped vector's highest-cosine lower-id tau-neighbor)."""
    import numpy as np

    from dump1090_stream_parser_spark.operators.similarity import (
        N_CELLS,
        SEMANTIC_DEDUP_TAU,
        q_semantic_dedup,
    )

    from decimal import ROUND_HALF_UP, Decimal

    rows = {
        r.vec_id: r for r in q_semantic_dedup(spark, SF_DIR).collect()
    }
    emb = {
        r.vec_id: np.asarray([float(v) for v in r.embedding])
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def fold(a, b):
        # Same sequential left fold as the JVM/oracle expressions --
        # np.dot's BLAS pairwise summation rounds differently and
        # would make this reference corpus-dependently flaky.
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        raw = fold(a, b) / (
            np.sqrt(fold(a, a)) * np.sqrt(fold(b, b))
        )
        # Spark/DuckDB ROUND is decimal HALF_UP; python round is not.
        return float(
            Decimal(float(raw)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )

    cents = {c: emb[c] for c in range(1, N_CELLS + 1)}
    # nearest centroid, cosine round(6), ties toward the lowest cell id
    cell = {
        v: min(
            cents, key=lambda c: (-cos(emb[v], cents[c]), c)
        )
        for v in emb
    }
    expected = {}
    for v in emb:
        neigh = [
            (cos(emb[u], emb[v]), u)
            for u in emb
            if u < v and cell[u] == cell[v]
        ]
        neigh = [(c, u) for c, u in neigh if c >= SEMANTIC_DEDUP_TAU]
        if neigh:
            c, u = max(neigh, key=lambda t: (t[0], -t[1]))
            expected[v] = (u, c, cell[v])
    assert set(rows) == set(expected)
    assert expected, "planted corpus should yield at least one dup"
    for v, (u, c, cl) in expected.items():
        r = rows[v]
        assert (r.kept_by, r.cos_sim, r.cell_id) == (u, c, cl), (v, r)


def test_weighted_sample_prefers_heavy_docs(spark):
    """The Efraimidis-Spirakis keys must actually bias the sample: with
    w = ln(1+n_chars) increasing in length, the kept docs' mean length
    should exceed the population's (the draw is deterministic, so this
    pins the fixed outcome, not a flaky statistic), every source must
    keep exactly K docs, and priorities must sit in (0, 1]."""
    from dump1090_stream_parser_spark.operators.pipeline_ops import (
        WEIGHTED_SAMPLE_K,
        q_weighted_sample,
    )

    kept = q_weighted_sample(spark, SF_DIR).collect()
    per_source: dict[str, int] = {}
    for r in kept:
        per_source[r.source] = per_source.get(r.source, 0) + 1
        assert 0.0 < r.priority <= 1.0, r
        assert 1 <= r.rank <= WEIGHTED_SAMPLE_K, r
    docs = load_table(spark, SF_DIR, "documents").collect()
    sources = {d.source for d in docs}
    assert per_source == {s: WEIGHTED_SAMPLE_K for s in sources}
    pop_mean = sum(d.n_chars for d in docs) / len(docs)
    kept_mean = sum(r.n_chars for r in kept) / len(kept)
    assert kept_mean > pop_mean, (kept_mean, pop_mean)


def test_semantic_dedup_trained_quantizer_manifest(spark):
    """The production entry point (k-means-trained quantizer feeding
    the same manifest pipeline) must produce a structurally valid
    manifest: every dropped vector names a strictly lower-id keeper,
    attribution cosine clears the threshold, and the trained quantizer
    -- which packs near-dups into tighter cells than the arbitrary
    seed quantizer -- must not find fewer duplicates than the seeds."""
    from dump1090_stream_parser_spark.operators.similarity import (
        SEMANTIC_DEDUP_TAU,
        q_semantic_dedup,
        semantic_dedup_trained,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = semantic_dedup_trained(emb, iters=2).collect()
    assert rows
    for r in rows:
        assert r.kept_by < r.vec_id
        assert r.cos_sim >= SEMANTIC_DEDUP_TAU
    seed_n = q_semantic_dedup(spark, SF_DIR).count()
    assert len(rows) >= seed_n * 0.8, (len(rows), seed_n)


def test_scd2_intervals_partition_each_timeline(spark):
    """SCD-2 structural invariants the value-hash can't articulate:
    per user, versions are 1..n dense, consecutive intervals chain
    (valid_to of version v == valid_from of v+1), exactly the last
    version is open/is_current, and adjacent versions never carry the
    same state (else the change filter failed)."""
    from dump1090_stream_parser_spark.operators.windows import (
        q_scd2_intervals,
    )

    rows = q_scd2_intervals(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)
            assert not a.is_current
            assert a.event_type != b.event_type, (user, a, b)
        assert vs[-1].is_current and vs[-1].valid_to is None


def test_ann_ivf_join_recall_vs_exact_per_query(spark):
    """Quality gate for the batch IVF probe join beyond oracle
    equality: per-query recall@k against the exact top-k computed on
    the SAME query/corpus split (driver-side, same round-6 left-fold
    cosine + tie-break). nprobe=2 of N_CELLS=8 scans ~25% of a
    near-uniform corpus (the hardest ANN regime), so the mean floor is
    modest but must clear the 0.25 a random 2-cell probe would get;
    every query must also return exactly K rows (probed cells are
    never empty at this SF)."""
    from dump1090_stream_parser_spark.operators.similarity import (
        ANN_JOIN_K,
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        _cos_py,
        q_ann_ivf_join,
    )
    from dump1090_stream_parser_spark.tables import load_table

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    qs = {
        r.vec_id: [float(v) for v in r.embedding]
        for r in rows
        if ANN_JOIN_Q_LO <= r.vec_id <= ANN_JOIN_Q_HI
    }
    corpus = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in rows
        if not (ANN_JOIN_Q_LO <= r.vec_id <= ANN_JOIN_Q_HI)
    ]
    truth = {}
    for qid, qv in qs.items():
        scored = sorted(
            ((round(_cos_py(qv, cv), 6), -vid) for vid, cv in corpus),
            reverse=True,
        )
        truth[qid] = {-s[1] for s in scored[:ANN_JOIN_K]}
    got = {}
    for r in q_ann_ivf_join(spark, SF_DIR).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(got) == set(truth)
    assert all(len(v) == ANN_JOIN_K for v in got.values()), got
    recalls = {q: len(got[q] & t) / ANN_JOIN_K for q, t in truth.items()}
    mean = sum(recalls.values()) / len(recalls)
    assert mean >= 0.3, recalls


def test_countmin_grid_matches_reference_under_collisions(spark):
    """Force bucket collisions (width far below the key cardinality)
    and pin the count-min structure against a pure-Python rebuild from
    exact counts: every grid cell is EXACTLY the sum of the true
    counts of the keys hashing there, each depth row sums to N, and
    the resulting point estimate over-counts every key (the structural
    guarantee the registered query's overcount_ok column asserts at
    the production width)."""
    import hashlib

    from dump1090_stream_parser_spark.operators.pipeline_ops import (
        countmin_cells,
    )

    depth, width = 4, 8  # events has ~15 distinct user_ids -> collisions
    ev = load_table(spark, SF_DIR, "events").repartition(8)

    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())

    def bucket(key: int, j: int) -> int:
        h = int(hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:15], 16)
        return h % width

    ref = {}
    for key, n in exact.items():
        for j in range(depth):
            cell = (j, bucket(key, j))
            ref[cell] = ref.get(cell, 0) + n

    got = {
        (r["j"], r["bucket"]): r["c"]
        for r in countmin_cells(ev, "user_id", depth, width).collect()
    }
    assert got == ref
    for j in range(depth):
        assert sum(c for (dj, _), c in got.items() if dj == j) == n_total

    collided = 0
    for key, true in exact.items():
        est = min(got[(j, bucket(key, j))] for j in range(depth))
        assert est >= true, (key, est, true)
        collided += est > true
    assert collided > 0, "width must force collisions for this test"


def test_random_projection_preserves_norms_and_distances(spark):
    """The JL content of q_random_projection: with +-1/sqrt(k) entries,
    E[||y||^2] = ||x||^2 -- per-vector squared-norm ratios concentrate
    around 1, and (by linearity) so do pairwise squared distances.
    The dataset and matrix are deterministic, so the bounds are stable."""
    import math

    from dump1090_stream_parser_spark.operators.similarity import (
        RP_DIMS,
        _rp_planes_py,
    )

    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    dim = len(next(iter(emb.values())))
    planes = _rp_planes_py(dim, RP_DIMS)

    def project(x):
        return [sum(p[d] * x[d] for d in range(dim)) for p in planes]

    def sq(v):
        return sum(c * c for c in v)

    ratios = []
    proj = {}
    for vid, x in emb.items():
        y = project(x)
        proj[vid] = y
        ratios.append(sq(y) / sq(x))
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    assert all(0.2 < r < 2.8 for r in ratios), (min(ratios), max(ratios))

    # pairwise distances ride the same concentration (linearity)
    ids = sorted(emb)[:10]
    for a, b in zip(ids, ids[1:]):
        dx = sq([p - q for p, q in zip(emb[a], emb[b])])
        dy = sq([p - q for p, q in zip(proj[a], proj[b])])
        assert 0.2 < dy / dx < 2.8, (a, b, dy / dx)

    # and the registered query's Spark-side values equal this
    # driver-side rebuild to float tolerance (exact cross-engine
    # equality vs DuckDB is the parity gate's job)
    import __spark_entry__ as e

    got = e.queries()["q_random_projection"](spark, SF_DIR).collect()
    for r in got[: 5 * RP_DIMS]:
        assert math.isclose(
            r["y"], proj[r["vec_id"]][r["out_dim"]], rel_tol=1e-9, abs_tol=1e-9
        )


def test_kmv_overlap_estimates_within_envelope(spark):
    """The KMV sketch's statistical content (oracle equality proves
    faithful execution, this proves the estimator is worth executing):
    with K=64 the union estimator's rsd is ~1/sqrt(K-2) ~ 13% and the
    Jaccard match fraction's sd is ~sqrt(J(1-J)/K) ~ 0.06 here, so
    3-sigma-ish envelopes hold deterministically on this corpus
    (measured worst: union 6.4%, jaccard 0.05, intersection 19%)."""
    import __spark_entry__ as e

    rows = e.queries()["q_set_overlap_kmv"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        exact_union = r["n_a"] + r["n_b"] - r["inter_exact"]
        true_j = r["inter_exact"] / exact_union
        assert r["inter_exact"] > 0
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert (
            abs(r["union_est"] - exact_union) / exact_union < 0.30
        ), (r["type_a"], r["type_b"], r["union_est"], exact_union)
        assert abs(r["jaccard_est"] - true_j) < 0.15, (
            r["type_a"], r["type_b"], r["jaccard_est"], true_j,
        )
        assert (
            abs(r["inter_est"] - r["inter_exact"]) / r["inter_exact"] < 0.60
        ), (r["type_a"], r["type_b"], r["inter_est"], r["inter_exact"])


def test_source_divergence_matches_numpy_and_bounds(spark):
    """q_source_divergence's statistical content: every pair's JS
    divergence equals an independent numpy recomputation from exact
    token counts (to the emitted 6-decimal rounding) and respects the
    [0, ln 2] bound; identical sources would give 0, disjoint ln 2."""
    import math

    import numpy as np

    import __spark_entry__ as e
    from dump1090_stream_parser_spark.operators.text import tokens_col

    tc = (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.explode(tokens_col()).alias("token"))
        .groupBy("source", "token")
        .count()
        .collect()
    )
    counts: dict[str, dict[str, int]] = {}
    for r in tc:
        counts.setdefault(r["source"], {})[r["token"]] = r["count"]

    def js(a: dict, b: dict) -> float:
        na, nb = sum(a.values()), sum(b.values())
        vocab = sorted(set(a) | set(b))
        p = np.array([a.get(t, 0) / na for t in vocab])
        q = np.array([b.get(t, 0) / nb for t in vocab])
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(p > 0, p * np.log(2 * p / (p + q)), 0.0)
            tb = np.where(q > 0, q * np.log(2 * q / (p + q)), 0.0)
        return float(0.5 * ta.sum() + 0.5 * tb.sum())

    rows = e.queries()["q_source_divergence"](spark, SF_DIR).collect()
    srcs = sorted(counts)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        ref = js(counts[r["source_a"]], counts[r["source_b"]])
        assert 0.0 <= r["js_div"] <= math.log(2) + 1e-9, r
        assert abs(r["js_div"] - ref) < 2e-6, (
            r["source_a"], r["source_b"], r["js_div"], ref,
        )


def test_ann_trained_quantizer_fixture_and_recall(spark):
    """q_ann_ivf_trained quality gates: (1) the persisted centroid
    fixture is well-formed -- N_CELLS unit-norm vectors of the corpus
    dim; (2) the trained quantizer beats the seed quantizer on the
    spherical-k-means objective (mean best-cos -- the thing training
    optimizes; 0.268 vs 0.194 at fixture-build time on sf0.01);
    (3) the nprobe=2 probe still clears the random-scan recall floor
    (a 2/8-cell random scan would recall ~0.25 on average; the
    near-uniform corpus makes per-query recall noisy, so the floor is
    the LSH-tier 0.3)."""
    import math

    from dump1090_stream_parser_spark.operators.similarity import (
        _IVF_FIXTURE,
        N_CELLS,
        _seed_centroid_rows,
        q_ann_ivf_trained,
        q_knn_cosine,
        quantizer_quality,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from pyspark.sql import functions as F

    cents = sorted(
        spark.read.parquet(_IVF_FIXTURE).collect(),
        key=lambda r: r["cell_id"],
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    assert [r["cell_id"] for r in cents] == list(range(N_CELLS))
    for r in cents:
        assert len(r["cv"]) == dim
        assert math.isclose(
            math.sqrt(sum(v * v for v in r["cv"])), 1.0, abs_tol=1e-9
        )

    seed = [[float(v) for v in r["embedding"]] for r in _seed_centroid_rows(emb)]
    trained = [[float(v) for v in r["cv"]] for r in cents]
    assert quantizer_quality(emb, trained) > quantizer_quality(emb, seed)

    truth = set(
        [r["vec_id"] for r in q_knn_cosine(spark, SF_DIR).collect()][:10]
    )
    got = {r["vec_id"] for r in q_ann_ivf_trained(spark, SF_DIR).collect()}
    assert len(got & truth) / 10 >= 0.3, sorted(got & truth)


def test_ann_trained_join_recall_vs_exact_per_query(spark):
    """q_ann_ivf_trained_join quality gate: per-query recall@k against
    the exact top-k over the same corpus exclusion, with the LSH-tier
    mean floor (near-uniform corpus; nprobe=2 of 8 trained cells)."""
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.functions.vector import (
        cosine_similarity,
    )
    from dump1090_stream_parser_spark.operators.similarity import (
        ANN_JOIN_K,
        ANN_JOIN_Q_HI,
        ANN_JOIN_Q_LO,
        q_ann_ivf_trained_join,
    )
    from dump1090_stream_parser_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    is_q = F.col("vec_id").between(ANN_JOIN_Q_LO, ANN_JOIN_Q_HI)
    queries = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(is_q).collect()
    }
    corpus = emb.filter(~is_q)
    truth = {}
    for qid, qv in queries.items():
        arr = F.array(*[F.lit(float(v)) for v in qv])
        top = (
            corpus.select(
                "vec_id",
                cosine_similarity(F.col("embedding"), arr).alias("c"),
            )
            .orderBy(F.desc("c"), F.asc("vec_id"))
            .limit(ANN_JOIN_K)
            .collect()
        )
        truth[qid] = {r["vec_id"] for r in top}

    got: dict[int, set] = {}
    for r in q_ann_ivf_trained_join(spark, SF_DIR).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = {q: len(got.get(q, set()) & t) / ANN_JOIN_K for q, t in truth.items()}
    mean = sum(recalls.values()) / len(recalls)
    assert mean >= 0.3, recalls
