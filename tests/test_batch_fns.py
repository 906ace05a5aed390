"""Property tests for the Arrow-batch Python functions (no Spark session:
these run the pandas functions directly, so hypothesis can afford many
examples). Invariant under test: the vectorized batch implementations
equal their scalar reference semantics on arbitrary inputs."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from dump1090_stream_parser_spark.operators.multimodal import (
    FRAME_CHARS,
    N_HISTOGRAM_BINS,
    SAMPLE_EVERY,
    _decode_payload,
    extract_features,
    sample_frames,
)

payloads = st.lists(st.binary(max_size=200), min_size=0, max_size=20)
texts = st.lists(
    st.text(max_size=300, alphabet=st.characters(blacklist_categories=("Cs",))),
    min_size=0,
    max_size=20,
)


@settings(max_examples=50, deadline=None)
@given(payloads)
@example(
    ps=[b'\x00\xff'],
).via('discovered failure')
@example(
    ps=[b'\xff'],
).via('discovered failure')
def test_vectorized_features_equal_scalar_codec(ps):
    pdf = pd.DataFrame({"doc_id": range(len(ps)), "payload": ps})
    out = pd.concat(list(extract_features(iter([pdf]))), ignore_index=True)
    assert len(out) == len(ps)
    for i, p in enumerate(ps):
        ref = _decode_payload(p)
        row = out.iloc[i]
        assert row["n_bytes"] == len(p)
        assert row["fake_width"] == ref["fake_width"]
        assert row["fake_height"] == ref["fake_height"]
        assert list(row["byte_histogram"]) == ref["byte_histogram"]
        assert abs(sum(row["byte_histogram"]) - (1.0 if p else 0.0)) < 1e-9


@settings(max_examples=50, deadline=None)
@given(texts)
def test_frame_sampler_matches_formula(ts):
    pdf = pd.DataFrame({"doc_id": range(len(ts)), "text": ts})
    out = pd.concat(list(sample_frames(iter([pdf]))), ignore_index=True)
    expected_rows = 0
    for doc_id, text in enumerate(ts):
        n_frames = (len(text) - 1) // FRAME_CHARS + 1 if text else 0
        idxs = [i for i in range(n_frames) if i % SAMPLE_EVERY == 0]
        expected_rows += len(idxs)
        got = out[out["doc_id"] == doc_id]
        assert list(got["frame_idx"]) == idxs
        for _, r in got.iterrows():
            frame = text[
                r["frame_idx"] * FRAME_CHARS : (r["frame_idx"] + 1)
                * FRAME_CHARS
            ]
            assert r["frame_len"] == len(frame)
            assert r["frame_fp"] == int(
                hashlib.md5(frame.encode()).hexdigest()[:15], 16
            )
    assert len(out) == expected_rows


# ---------------------------------------------------------------------------
# Misra-Gries core (functions/sketches.py): the guarantees must hold for
# ANY key sequence, ANY batching of it, and ANY capacity.
# ---------------------------------------------------------------------------

key_batches = st.lists(
    st.lists(st.integers(min_value=-50, max_value=50), max_size=60),
    min_size=0,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(batches=key_batches, cap=st.integers(min_value=1, max_value=12))
def test_mg_merge_guarantees_any_batching(batches, cap):
    from collections import Counter

    from dump1090_stream_parser_spark.functions.sketches import mg_merge

    summary, dec = None, 0
    for b in batches:
        vc = pd.Series(b, dtype="int64").value_counts()
        summary, d = mg_merge(summary, vc, cap)
        dec += d

    true = Counter(k for b in batches for k in b)
    reported = {} if summary is None else summary.to_dict()
    # size bound
    assert len(reported) <= cap
    # lower/upper bound for every reported key
    for k, est in reported.items():
        assert 0 < est <= true[k] <= est + dec, (k, est, true[k], dec)
    # no key above the decrement is missing
    for k, t in true.items():
        if t > dec:
            assert k in reported, (k, t, dec)
    # decrement never exceeds the analytic bound n/(cap+1)
    n = sum(true.values())
    assert dec <= n // (cap + 1)


def test_array_sql_rejects_non_finite():
    """The SQL-literal renderer must fail loudly at the Python boundary
    on nan/inf (repr would otherwise render a bare token the SQL parser
    resolves as a COLUMN reference -- an unresolved-column error far
    from the cause)."""
    import math

    import pytest

    from dump1090_stream_parser_spark.operators.similarity import (
        _array_sql,
    )

    assert "CAST(0.5 AS DOUBLE)" in _array_sql((0.5,))
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError, match="non-finite"):
            _array_sql((1.0, bad))


def test_cell_pair_scores_blocked_equals_bruteforce():
    """The j-blocked, column-sliced scorer must equal a brute-force
    sequential-fold reference on arbitrary inputs -- in particular
    across block boundaries, which the sf-corpus tests never exercise
    (every test cell fits one block). Runs the pure pandas function
    with the block size shrunk to 3."""
    import numpy as np
    import pandas as pd

    from dump1090_stream_parser_spark.operators import similarity as sim

    rng_ids = list(range(100, 100 + 17))
    # deterministic 'random' vectors via integer hashing (no RNG APIs)
    vecs = [
        [((i * 31 + d * 17) % 19 - 9) / 9.0 for d in range(5)]
        for i in rng_ids
    ]
    pdf = pd.DataFrame(
        {
            "vec_id": rng_ids,
            "cell_id": [7] * len(rng_ids),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
        }
    )
    tau = 0.3

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    e64 = [np.asarray(v, dtype="float32").astype("float64") for v in vecs]
    expected = {}
    for j in range(len(rng_ids)):
        for i in range(j):
            c = fold(e64[i], e64[j]) / (
                np.sqrt(fold(e64[i], e64[i]))
                * np.sqrt(fold(e64[j], e64[j]))
            )
            if c >= tau - 1e-6:
                expected[(rng_ids[i], rng_ids[j])] = c
    assert expected, "fixture must produce near-threshold pairs"
    assert len(rng_ids) > 3, "must span multiple blocks"

    orig = sim._SEM_DEDUP_BLOCK
    sim._SEM_DEDUP_BLOCK = 3
    try:
        out = sim._score_cell_pairs(pdf, tau)
    finally:
        sim._SEM_DEDUP_BLOCK = orig
    got = {
        (r.kept_by, r.vec_id): r.cos_raw for r in out.itertuples()
    }
    assert got.keys() == expected.keys()
    for k, v in expected.items():
        assert got[k] == v, (k, got[k], v)  # bit-exact, not approx
    assert set(out["cell_id"]) == {7}


def test_pmi_matches_python(spark):
    """q_pmi third-engine check: recompute document frequencies,
    co-presence, and PMI for every reported pair in pure Python."""
    import math
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.text import (
        PMI_MIN_SUP,
        PMI_VOCAB,
        q_pmi,
    )
    from dump1090_stream_parser_spark.tables import load_table

    from .conftest import SF_DIR

    got = {
        (r["token_1"], r["token_2"]): r
        for r in q_pmi(spark, SF_DIR).collect()
    }
    assert got, "pmi pairs expected"

    docs = {
        r["doc_id"]: {t for t in r["text"].split(" ") if t}
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    df = defaultdict(int)
    for toks in docs.values():
        for t in toks:
            df[t] += 1
    n_docs = sum(1 for toks in docs.values() if toks)
    vocab = set(
        sorted(df, key=lambda t: (-df[t], t))[:PMI_VOCAB]
    )
    both = defaultdict(int)
    for toks in docs.values():
        hits = sorted(toks & vocab)
        for i, a in enumerate(hits):
            for b in hits[i + 1:]:
                both[(a, b)] += 1
    expect = {
        p: c for p, c in both.items() if c >= PMI_MIN_SUP
    }
    assert got.keys() == expect.keys()
    for (a, b), r in got.items():
        assert (r["df1"], r["df2"], r["n_both"]) == (
            df[a], df[b], expect[(a, b)]
        )
        ref = math.log(expect[(a, b)] * n_docs / (df[a] * df[b]))
        assert math.isclose(r["pmi"], ref, rel_tol=1e-9, abs_tol=5.01e-7)
        assert a < b and r["n_both"] >= PMI_MIN_SUP


def test_text_entropy_matches_python(spark):
    """q_text_entropy third-engine check: recompute the bigram
    entropy for every document with math.log."""
    import math
    from collections import Counter

    from dump1090_stream_parser_spark.operators.text import (
        q_text_entropy,
    )
    from dump1090_stream_parser_spark.tables import load_table

    from .conftest import SF_DIR

    got = {
        r["doc_id"]: r for r in q_text_entropy(spark, SF_DIR).collect()
    }
    assert got, "entropy rows expected"
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
        if len(r["text"]) >= 2
    }
    assert got.keys() == docs.keys()
    for doc_id, text in docs.items():
        counts = Counter(text[i:i + 2] for i in range(len(text) - 1))
        n = sum(counts.values())
        ent = math.log(n) - sum(
            c * math.log(c) for c in counts.values()
        ) / n
        g = got[doc_id]
        assert g["n_bigrams"] == n
        assert g["distinct_bigrams"] == len(counts)
        assert math.isclose(
            g["entropy"], ent, rel_tol=1e-9, abs_tol=5.01e-7
        )
        if len(counts) > 1:
            ratio = ent / math.log(len(counts))
            assert math.isclose(
                g["entropy_ratio"], ratio, rel_tol=1e-9, abs_tol=5.01e-7
            )
            assert -1e-9 <= g["entropy_ratio"] <= 1 + 1e-9
        assert g["entropy"] <= math.log(max(len(counts), 1)) + 1e-9


def test_decile_lift_matches_python(spark):
    """Third-engine recompute of the lift table from the scored frame,
    plus the structural identities: equal-count deciles (+-1),
    positives conserved, cum_capture monotone to 1.0."""
    import math

    from dump1090_stream_parser_spark.operators.inference import (
        featurize_docs,
        model_score,
        q_decile_lift,
    )
    from dump1090_stream_parser_spark.tables import load_table

    from .conftest import SF_DIR

    got = sorted(
        q_decile_lift(spark, SF_DIR).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in got] == list(range(1, 11))
    docs = load_table(spark, SF_DIR, "documents")
    scored = {
        r["doc_id"]: r["score"]
        for r in model_score(featurize_docs(docs)).collect()
    }
    pos = {
        r["doc_id"]: 1 if r["lang"] == "en" else 0
        for r in docs.select("doc_id", "lang").collect()
    }
    order = sorted(scored, key=lambda d: (-scored[d], d))
    n = len(order)
    # ntile semantics: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    idx, expect = 0, []
    tp = sum(pos.values())
    cum = 0
    for i, size in enumerate(sizes, start=1):
        chunk = order[idx: idx + size]
        idx += size
        npos = sum(pos[d] for d in chunk)
        cum += npos
        expect.append((i, size, npos, npos / size, cum / tp))
    base_rate = tp / n
    for r, (i, size, npos, rate, cap) in zip(got, expect):
        assert (r["decile"], r["n"], r["npos"]) == (i, size, npos)
        assert math.isclose(
            r["response_rate"], rate, rel_tol=0, abs_tol=5.01e-7
        )
        assert math.isclose(
            r["lift"], rate / base_rate, rel_tol=0, abs_tol=5.01e-7
        )
        assert math.isclose(
            r["cum_capture"], cap, rel_tol=0, abs_tol=5.01e-7
        )
    caps = [r["cum_capture"] for r in got]
    assert caps == sorted(caps) and abs(caps[-1] - 1.0) < 1e-9
    assert sum(r["npos"] for r in got) == tp
    assert max(r["n"] for r in got) - min(r["n"] for r in got) <= 1


def test_auc_matches_pairwise_definition(spark):
    """Cross-check the rank-sum AUC against the O(np*nn) pairwise
    definition (feasible at the test SF), plus the sentinel values a
    broken AUC always betrays: score==target ranking -> 1.0,
    inverted -> 0.0, constant scores -> 0.5."""
    import math

    from dump1090_stream_parser_spark.operators.inference import (
        featurize_docs,
        model_score,
        q_auc,
    )
    from dump1090_stream_parser_spark.tables import load_table

    from .conftest import SF_DIR

    row = q_auc(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    docs = load_table(spark, SF_DIR, "documents")
    scored = {
        x["doc_id"]: x["score"]
        for x in model_score(featurize_docs(docs)).collect()
    }
    pos = {
        x["doc_id"]: x["lang"] == "en"
        for x in docs.select("doc_id", "lang").collect()
    }
    ps = [scored[d] for d in scored if pos[d]]
    ns = [scored[d] for d in scored if not pos[d]]
    assert (r["np"], r["nn"]) == (len(ps), len(ns))
    wins = sum(
        1.0 if p > n_ else (0.5 if p == n_ else 0.0)
        for p in ps
        for n_ in ns
    )
    auc = wins / (len(ps) * len(ns))
    assert math.isclose(r["auc"], auc, rel_tol=0, abs_tol=5.01e-7)
    assert math.isclose(
        r["gini"], 2 * auc - 1, rel_tol=0, abs_tol=1.01e-6
    )

    def rank_auc(pairs):  # [(score, is_pos)] -> auc via the same algebra
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0])
        for s, p in pairs:
            agg[s][0 if p else 1] += 1
        below_n, u2 = 0, 0
        for s in sorted(agg):
            cp, cn = agg[s]
            u2 += cp * (2 * below_n + cn)
            below_n += cn
        np_ = sum(1 for _, p in pairs if p)
        nn_ = len(pairs) - np_
        return u2 / (2 * np_ * nn_)

    assert rank_auc([(1.0, True), (0.0, False)] * 3) == 1.0
    assert rank_auc([(0.0, True), (1.0, False)] * 3) == 0.0
    assert rank_auc([(0.5, True), (0.5, False)] * 3) == 0.5
