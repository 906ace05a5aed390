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


def test_bitmap_index_matches_python(spark):
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.indexing import (
        TOP_PATTERNS,
        q_bitmap_index,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = [
        (r["month_bitmap"], r["n_parts"], r["months_active"],
         r["all_quarters"])
        for r in q_bitmap_index(spark, SF_DIR).collect()
    ]
    assert got, "bitmap patterns expected"

    bitmaps: dict[int, int] = defaultdict(int)
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_shipdate")
        .collect()
    ):
        bitmaps[r["l_partkey"]] |= 1 << (r["l_shipdate"].month - 1)
    counts: dict[int, int] = defaultdict(int)
    for bm in bitmaps.values():
        counts[bm] += 1
    expect = sorted(
        (
            (bm, n, bin(bm).count("1"),
             all(bm & m for m in (0x007, 0x038, 0x1C0, 0xE00)))
            for bm, n in counts.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:TOP_PATTERNS]
    assert got == expect or sorted(got, key=lambda t: (-t[1], t[0])) == expect
    for bm, _, months_active, _ in got:
        assert 0 < bm < 4096 and months_active == bin(bm).count("1")
