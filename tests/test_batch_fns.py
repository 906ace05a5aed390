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
