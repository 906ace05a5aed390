"""Streaming MinHash near-dup detection (streaming/near_dup.py):
candidate pairs must match the batch banding stage exactly, INCLUDING
pairs whose two documents arrive in different micro-batches (the whole
point of carrying bucket state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.dedup import (
    minhash_bands,
    minhash_shingles,
)
from dump1090_stream_parser_spark.streaming.near_dup import (
    near_dup_candidates_stream,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _batch_candidate_pairs(docs):
    bands = minhash_bands(minhash_shingles(docs))
    a, b = bands.alias("a"), bands.alias("b")
    return {
        (r.d1, r.d2)
        for r in a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
        .collect()
    }


def test_stream_candidates_match_batch_across_microbatches(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    expected = _batch_candidate_pairs(docs)
    assert expected, "fixture corpus must contain near-dup candidates"

    # Split the corpus into two parquet files -> two micro-batches
    # (maxFilesPerTrigger=1), so some pairs must span the boundary.
    src = tmp_path / "docs_in"
    half = docs.count() // 2
    docs.filter(F.col("doc_id") < half).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        near_dup_candidates_stream(stream)
        .writeStream.format("memory")
        .queryName("near_dup_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # A stateful query with processing-time timeouts keeps scheduling
    # no-data batches (so TTLs can fire), which defeats availableNow
    # termination -- poll the sink until the result is complete, then
    # stop, instead of burning a fixed awaitTermination timeout.
    import time

    def _pairs():
        return {
            (r.doc_id_1, r.doc_id_2)
            for r in spark.sql(
                "SELECT doc_id_1, doc_id_2 FROM near_dup_pairs"
            ).collect()
            if r.doc_id_1 is not None
        }

    deadline = time.time() + 180
    got = _pairs()
    while got != expected and time.time() < deadline:
        time.sleep(1)
        got = _pairs()
    q.stop()
    q.awaitTermination(60)

    rows = spark.sql(
        "SELECT doc_id_1, doc_id_2, n_dropped FROM near_dup_pairs"
    ).collect()
    assert got == expected
    assert all(r.n_dropped == 0 for r in rows)  # no bucket overflowed
    # cross-boundary coverage: at least one pair spans the two batches
    assert any(a < half <= b for a, b in got)


def test_stream_state_survives_query_restart(spark, tmp_path):
    """The bucket membership must live in the checkpoint, not the JVM:
    stop the query after the first delivery, start a NEW query on the
    same checkpoint for the second delivery, and the cross-delivery
    pairs must still be found."""
    import shutil
    import time

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    expected = _batch_candidate_pairs(docs)
    half = docs.count() // 2

    src = tmp_path / "docs_restart"
    stage = tmp_path / "stage"
    docs.filter(F.col("doc_id") < half).coalesce(1).write.parquet(
        str(stage / "a.parquet")
    )
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.parquet(
        str(stage / "b.parquet")
    )
    src.mkdir()
    shutil.copytree(stage / "a.parquet", src / "a.parquet")

    out = str(tmp_path / "pairs_out")

    def pairs_out():
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:  # noqa: BLE001 -- sink dir not created yet
            return set()
        return {
            (r.doc_id_1, r.doc_id_2)
            for r in rows
            if r.doc_id_1 is not None
        }

    def run_until(pred):
        # the file sink (unlike memory) supports checkpoint recovery --
        # which is the thing under test
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            near_dup_candidates_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_restart"))
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and not pred():
            time.sleep(1)
        assert pred(), "expected sink state never arrived"
        try:
            q.stop()
            q.awaitTermination(60)
        except Exception:  # noqa: BLE001 -- stop() interrupts the
            pass  # in-flight no-data batch; the sink assertions decide

    expected_a = {(a, b) for a, b in expected if a < half and b < half}
    run_until(lambda: pairs_out() == expected_a)
    pairs_after_first = pairs_out()
    # second delivery arrives AFTER the first query is gone
    shutil.copytree(stage / "b.parquet", src / "b.parquet")
    run_until(lambda: pairs_out() == expected)

    # the second run must have produced cross-delivery pairs from
    # restored state (doc_1 from delivery A, doc_2 from delivery B)
    run2 = pairs_out() - pairs_after_first
    assert any(a < half <= b for a, b in run2)
