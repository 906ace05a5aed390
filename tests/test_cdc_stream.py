"""Streaming CDC (streaming/cdc.py): the live view must equal the
batch q_cdc_apply frame row-for-row -- including under REVERSE-order
replay (the state is a lattice, no ordered-arrival contract) and
across a checkpoint restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.cdc import q_cdc_apply
from dump1090_stream_parser_spark.streaming.cdc import (
    cdc_stream,
    latest_cdc,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR

_SCHEMA = (
    "user_id long, ts timestamp, event_id long, op string, value double"
)

_OP = (
    "CASE WHEN event_type = 'signup' THEN 'I'"
    " WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
)


def _log(spark):
    return load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", F.expr(_OP).alias("op"), "value"
    )


def _write_files(spark, out_dir, order_cols, n_files=3):
    """Split the log into n time-sliced files written in the given
    global order -- ascending ts replays forward, descending replays
    the NEWEST slice first (adversarial arrival order)."""
    log = _log(spark).orderBy(*order_cols)
    rows = log.collect()
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk:(i + 1) * chunk]
        spark.createDataFrame(part, schema=_SCHEMA).coalesce(1).write.parquet(
            str(out_dir / f"f{i}.parquet")
        )


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        cdc_stream(stream)
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
        r["user_id"]: (
            r["n_ops"],
            r["n_deletes"],
            r["last_op"],
            r["current_value"],
            r["last_ts"],
        )
        for r in q_cdc_apply(spark, SF_DIR).collect()
    }


def _live(spark, out):
    return {
        r["user_id"]: (
            r["n_ops"],
            r["n_deletes"],
            r["last_op"],
            r["current_value"],
            r["last_ts"],
        )
        for r in latest_cdc(spark.read.parquet(out)).collect()
    }


def test_stream_equals_batch_forward_replay(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src, [F.asc("ts"), F.asc("event_id")])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, src, out, ckpt)
    assert _live(spark, out) == _batch(spark)


def test_stream_equals_batch_reverse_replay(spark, tmp_path):
    """The lattice claim: replaying the NEWEST data first converges to
    the same live view -- counts are additive, last-writer is an
    argmax over the data-carried order, so arrival order is free."""
    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src, [F.desc("ts"), F.desc("event_id")])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, src, out, ckpt)
    assert _live(spark, out) == _batch(spark)


def test_stream_survives_checkpoint_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_files(spark, src, [F.asc("ts"), F.asc("event_id")], n_files=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # first run: only the first file exists yet
    import shutil

    staged = tmp_path / "staged"
    staged.mkdir()
    shutil.move(str(src / "f1.parquet"), str(staged / "f1.parquet"))
    _run(spark, src, out, ckpt)
    # second run: the rest arrives, same checkpoint
    shutil.move(str(staged / "f1.parquet"), str(src / "f1.parquet"))
    _run(spark, src, out, ckpt)
    assert _live(spark, out) == _batch(spark)
