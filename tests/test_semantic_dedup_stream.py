"""Streaming semantic dedup (streaming/semantic_dedup.py): per-arrival
verdicts must reproduce the batch q_semantic_dedup manifest exactly,
INCLUDING drops whose keeper arrived in an earlier micro-batch (the
point of carrying cell membership as state)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.similarity import (
    _seed_centroid_rows,
    q_semantic_dedup,
)
from dump1090_stream_parser_spark.streaming.semantic_dedup import (
    semantic_dedup_stream,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR


def _start(spark, tmp_path, src, name, **kwargs):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = _seed_centroid_rows(emb)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    return (
        semantic_dedup_stream(stream, cents, **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )


def _poll(spark, name, done):
    """Stateful queries with processing-time timeouts keep scheduling
    no-data batches, defeating availableNow termination -- poll the
    sink until complete (same pattern as test_near_dup_stream)."""
    deadline = time.time() + 180
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    while not done(rows) and time.time() < deadline:
        time.sleep(1)
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    return rows


def test_stream_verdicts_match_batch_manifest(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    half = n // 2
    expected = {
        r.vec_id: (r.kept_by, r.cos_sim, r.cell_id)
        for r in q_semantic_dedup(spark, SF_DIR).collect()
    }
    assert expected, "fixture corpus must contain semantic dups"
    # cross-boundary coverage: some keeper precedes the split its
    # dropped vector arrives after
    assert any(
        k < half <= v for v, (k, _, _) in expected.items()
    ), "fixture should contain a cross-batch drop"

    src = tmp_path / "emb_in"
    emb.filter(F.col("vec_id") < half).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    emb.filter(F.col("vec_id") >= half).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )
    q = _start(spark, tmp_path, src, "sem_dedup_stream")
    rows = _poll(spark, "sem_dedup_stream", lambda rs: len(rs) >= n)
    q.stop()
    q.awaitTermination(60)

    assert len(rows) == n  # exactly one verdict per vector
    got_dropped = {
        r.vec_id: (r.kept_by, r.cos_sim, r.cell_id)
        for r in rows
        if r.dropped
    }
    assert got_dropped == expected
    kept = [r for r in rows if not r.dropped]
    assert all(
        r.kept_by is None and r.cos_sim is None for r in kept
    )
    assert all(r.n_overflow == 0 for r in rows)


def test_overflowing_cell_still_judges_arrivals(spark, tmp_path):
    """Past MAX_CELL_DOCS a cell stops storing members but must keep
    judging arrivals against the stored prefix and surface the
    overflow count."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    src = tmp_path / "emb_overflow"
    emb.coalesce(1).write.parquet(str(src / "a.parquet"))
    q = _start(
        spark, tmp_path, src, "sem_dedup_overflow", max_cell_docs=3
    )
    rows = _poll(spark, "sem_dedup_overflow", lambda rs: len(rs) >= n)
    q.stop()
    q.awaitTermination(60)

    assert len(rows) == n
    assert any(r.n_overflow > 0 for r in rows)
    # every dropped verdict still attributes a stored lower-id keeper
    for r in rows:
        if r.dropped:
            assert r.kept_by is not None and r.kept_by < r.vec_id


def test_stream_state_survives_query_restart(spark, tmp_path):
    """Cell membership must live in the checkpoint, not the JVM: stop
    the query after the first delivery, start a NEW query on the same
    checkpoint for the second, and cross-delivery drops (keeper from
    delivery A evicting a vector from delivery B) must still carry the
    batch manifest's exact keeper and cosine."""
    import shutil

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    half = n // 2
    expected = {
        r.vec_id: (r.kept_by, r.cos_sim, r.cell_id)
        for r in q_semantic_dedup(spark, SF_DIR).collect()
    }
    cross = {
        v: t for v, t in expected.items() if t[0] < half <= v
    }
    assert cross, "fixture should contain a cross-delivery drop"

    stage = tmp_path / "stage"
    emb.filter(F.col("vec_id") < half).coalesce(1).write.parquet(
        str(stage / "a.parquet")
    )
    emb.filter(F.col("vec_id") >= half).coalesce(1).write.parquet(
        str(stage / "b.parquet")
    )
    src = tmp_path / "emb_restart"
    src.mkdir()
    shutil.copytree(stage / "a.parquet", src / "a.parquet")

    out = str(tmp_path / "verdicts_out")
    cents = _seed_centroid_rows(load_table(spark, SF_DIR, "embeddings"))

    def verdicts():
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:  # noqa: BLE001 -- sink dir not created yet
            return []
        return rows

    def run_until(n_rows):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            semantic_dedup_stream(stream, cents)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_restart"))
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and len(verdicts()) < n_rows:
            time.sleep(1)
        try:
            q.stop()
            q.awaitTermination(60)
        except Exception:  # noqa: BLE001 -- stop() interrupts the
            pass  # in-flight no-data batch; the sink assertions decide
        assert len(verdicts()) >= n_rows

    run_until(half)
    # second delivery arrives AFTER the first query is gone
    shutil.copytree(stage / "b.parquet", src / "b.parquet")
    run_until(n)

    got_dropped = {
        r.vec_id: (r.kept_by, r.cos_sim, r.cell_id)
        for r in verdicts()
        if r.dropped
    }
    assert got_dropped == expected
    # decisive rows: keepers restored from the checkpointed state
    for v, t in cross.items():
        assert got_dropped[v] == t
