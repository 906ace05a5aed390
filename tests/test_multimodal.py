"""The multimodal codec is a stub, but the Arrow/mapInPandas plumbing is
real -- assert exact deterministic output through the Spark surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.multimodal import (
    N_HISTOGRAM_BINS,
    extract_features,
    q_multimodal_features,
)

from .conftest import SF_DIR


def test_feature_schema_and_determinism(spark):
    df = q_multimodal_features(spark, SF_DIR)
    # scalar h0..h15 (driver canonicalizer cannot hash array cells);
    # the array form stays available via extract_features directly
    hist_cols = ",".join(f"h{b}:double" for b in range(N_HISTOGRAM_BINS))
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,fake_width:int,"
        f"fake_height:int,{hist_cols}>"
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    rows2 = {r["doc_id"]: r for r in q_multimodal_features(spark, SF_DIR).collect()}
    assert rows.keys() == rows2.keys()
    some = sorted(rows)[:5]
    for k in some:
        assert rows[k] == rows2[k]  # bit-deterministic fake codec


def test_feature_values_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(3)
    payloads = [
        (r["doc_id"], r["text"].encode()) for r in docs.collect()
    ]
    df = q_multimodal_features(spark, SF_DIR)
    got = {r["doc_id"]: r for r in df.collect()}
    for doc_id, payload in payloads:
        hist = [0] * N_HISTOGRAM_BINS
        for byte in payload:
            hist[byte % N_HISTOGRAM_BINS] += 1
        expect = [h / len(payload) for h in hist]
        assert got[doc_id]["n_bytes"] == len(payload)
        got_hist = [
            got[doc_id][f"h{b}"] for b in range(N_HISTOGRAM_BINS)
        ]
        assert got_hist == pytest.approx(expect, abs=0)
        assert got[doc_id]["fake_width"] == payload[0] + 1


def test_resize_payloads_bounds_size(spark):
    from pyspark.sql import functions as F

    from dump1090_stream_parser_spark.operators.multimodal import (
        resize_payloads,
    )
    from dump1090_stream_parser_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = resize_payloads(docs, max_bytes=64).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r["resized_bytes"] <= 64
        assert r["resized_bytes"] == len(r["payload"])
        assert 0 < r["scale"] <= 1.0


def test_resize_payloads_decimates_to_budget(spark):
    """The resize stub must honor its byte budget and keep metadata
    consistent (deterministic decimation: every k-th byte, k = ceil)."""
    import pandas as pd

    from dump1090_stream_parser_spark.operators.multimodal import (
        resize_payloads,
    )

    data = [
        (1, b"a" * 10),
        (2, b"0123456789" * 20),  # 200 bytes -> k=4 -> 50 bytes
        (3, b""),
    ]
    df = spark.createDataFrame(data, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in resize_payloads(df, max_bytes=64).collect()}
    assert len(out) == 3
    for doc_id, payload in data:
        r = out[doc_id]
        assert r["orig_bytes"] == len(payload)
        assert r["resized_bytes"] <= 64
        assert r["resized_bytes"] == len(r["payload"])
        k = max(1, -(-len(payload) // 64))
        assert bytes(r["payload"]) == payload[::k]
        assert abs(r["scale"] - 1.0 / k) < 1e-12
