"""Inverted-index construction (operators/indexing.py): gap round-trip
and shard-order reconstruction against the raw (token, doc) pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.indexing import (
    SHARD_WIDTH,
    q_inverted_index,
)
from dump1090_stream_parser_spark.operators.text import tokens_col
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def test_gap_round_trip_and_shard_concat(spark):
    """Decoding (head_doc, gaps) per shard and concatenating a token's
    shards in shard order must reproduce the exact sorted posting list
    from the raw pairs -- the no-merge-pass property the doc-range
    sharding claims."""
    idx = q_inverted_index(spark, SF_DIR).collect()
    truth: dict[str, set[int]] = {}
    pairs = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens_col()).alias("token"), "doc_id")
        .distinct()
        .collect()
    )
    for r in pairs:
        truth.setdefault(r["token"], set()).add(int(r["doc_id"]))

    rebuilt: dict[str, list[int]] = {}
    for r in sorted(idx, key=lambda r: (r["token"], r["shard"])):
        ids = [int(r["head_doc"])]
        for g in (r["gaps"].split(",") if r["gaps"] else []):
            assert int(g) > 0  # strictly ascending within a shard
            ids.append(ids[-1] + int(g))
        assert len(ids) == r["df_shard"]
        assert all(i // SHARD_WIDTH == r["shard"] for i in ids)
        rebuilt.setdefault(r["token"], []).extend(ids)

    assert rebuilt.keys() == truth.keys()
    for token, ids in rebuilt.items():
        assert ids == sorted(ids), token  # shard concat stays sorted
        assert set(ids) == truth[token], token


def test_multiple_shards_exercised(spark):
    """The fixture corpus must actually span shards, or the shard
    logic is untested."""
    shards = {
        r["shard"] for r in q_inverted_index(spark, SF_DIR).collect()
    }
    assert len(shards) >= 2
