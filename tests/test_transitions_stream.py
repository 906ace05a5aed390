"""Streaming transitions (streaming/transitions.py): the summed delta
matrix must equal batch q_transitions row-for-row under ordered
replay, including across micro-batch splits and a checkpoint
restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.sequence import q_transitions
from dump1090_stream_parser_spark.streaming.transitions import (
    transition_matrix,
    transitions_stream,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR

_SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string"
)


def _write_files(spark, out_dir, n_files=3):
    """Global time-ordered split: per-key order preserved across files
    (the twin's ordered-arrival contract)."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk:(i + 1) * chunk]
        spark.createDataFrame(part, schema=_SCHEMA).coalesce(
            1
        ).write.parquet(str(out_dir / f"f{i}.parquet"))


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        transitions_stream(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _batch(spark):
    return {
        (r["prev_type"], r["next_type"]): (
            r["n_trans"],
            r["row_total"],
            r["p"],
        )
        for r in q_transitions(spark, SF_DIR).collect()
    }


def _stream(spark, out):
    return {
        (r["prev_type"], r["next_type"]): (
            r["n_trans"],
            r["row_total"],
            r["p"],
        )
        for r in transition_matrix(spark.read.parquet(out)).collect()
    }


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, src, out, ckpt)
    assert _stream(spark, out) == _batch(spark)


def test_stream_survives_checkpoint_restart(spark, tmp_path):
    import shutil

    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src, n_files=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    staged = tmp_path / "staged"
    staged.mkdir()
    shutil.move(str(src / "f1.parquet"), str(staged / "f1.parquet"))
    _run(spark, src, out, ckpt)
    shutil.move(str(staged / "f1.parquet"), str(src / "f1.parquet"))
    _run(spark, src, out, ckpt)
    assert _stream(spark, out) == _batch(spark)


def test_delta_counts_are_mergeable(spark, tmp_path):
    """The stateful stage emits DELTAS (per-key state is O(1), never
    the matrix): total emitted n across all rows equals the batch
    transition total, and per-key deltas never double-count."""
    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, src, out, ckpt)
    emitted = spark.read.parquet(out)
    total = emitted.agg(F.sum("n")).collect()[0][0]
    batch_total = sum(v[0] for v in _batch(spark).values())
    assert total == batch_total
