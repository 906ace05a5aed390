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


def test_idle_bucket_evicts_after_ttl(spark, tmp_path):
    """Cold-bucket eviction (VERDICT r4 ask #4): a bucket idle past the
    processing-time TTL must drop its state, so a near-dup of an EVICTED
    document produces NO pair (the recency trade documented in
    near_dup.py), while post-eviction members pair normally again.

    Three checkpointed runs with wall-clock TTL expiry between them;
    every condition is CUMULATIVE SINK CONTENT (never a transient state
    metric), with each delivery shipping a same-text pair so its own
    emission is the batch-completion signal:

      run 1: docs 0,1 share text T -> pair (0,1); buckets seeded.
      sleep past TTL.
      run 2: docs 12,13 share text U -> pair (12,13); the batch also
             fires doc 0/1's expired timers (eviction).
      run 3: docs 20,21 share text T -> pair (20,21) MUST appear and
             no (0,20)/(0,21)/(1,20)/(1,21) may EVER appear: the T
             bucket forgot docs 0/1 but re-seeds cleanly."""
    import time

    ttl_ms = 2_000
    t_text = "the quick brown fox jumps over the lazy dog again and again"
    u_text = "completely unrelated content about spark shuffle partitions"

    src = tmp_path / "ttl_in"
    src.mkdir()
    out = str(tmp_path / "ttl_pairs")
    ckpt = str(tmp_path / "ttl_ckpt")

    def deliver(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(src / name))

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

    def run_until(expected, timeout=120):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            near_dup_candidates_stream(stream, bucket_ttl_ms=ttl_ms)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + timeout
        while time.time() < deadline and pairs_out() != expected:
            time.sleep(0.5)
        try:
            q.stop()
            q.awaitTermination(60)
        except Exception:  # noqa: BLE001 -- stop() interrupts the
            pass  # in-flight no-data batch; the sink assertions decide
        assert pairs_out() == expected

    deliver("a.parquet", [(0, t_text), (1, t_text)])
    run_until({(0, 1)})

    time.sleep(ttl_ms / 1000 + 1.5)  # let the doc-0/1 bucket timers expire

    deliver("b.parquet", [(12, u_text), (13, u_text)])
    run_until({(0, 1), (12, 13)})

    deliver("c.parquet", [(20, t_text), (21, t_text)])
    run_until({(0, 1), (12, 13), (20, 21)})
    # the decisive absence: docs 20/21 re-entered the same T bucket and
    # paired only with each other -- never with the evicted docs 0/1
    assert not any(
        a in (0, 1) or b in (0, 1)
        for a, b in pairs_out() - {(0, 1)}
    )
