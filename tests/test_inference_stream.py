"""The inference pipeline (featurize -> mapInPandas model) is
mode-agnostic: the SAME operators run unchanged under Structured
Streaming and produce the SAME scores the batch query does, across
micro-batch boundaries. This is the property that lets one scoring
codepath serve both the backfill job and the live feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump1090_stream_parser_spark.operators.inference import (
    featurize_docs,
    model_score,
    q_model_score,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR

_DOC_SCHEMA = "doc_id long, text string"


def test_stream_scores_equal_batch_scores(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    half = docs.count() // 2
    src = tmp_path / "docs_in"
    docs.filter(F.col("doc_id") < half).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        model_score(featurize_docs(stream))
        .writeStream.format("memory")
        .queryName("scored_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in spark.sql("SELECT * FROM scored_stream").collect()
    }
    expected = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in q_model_score(spark, SF_DIR).collect()
    }
    assert got == expected  # bit-identical, both halves present


def test_model_score_degenerate_docs_get_defined_scores(spark):
    """Zero-token and empty-text documents must score deterministically
    (ratios defined as 0.0), never NULL/NaN -- 0/0 is engine-dependent
    and a NaN score would make `keep` silently false."""
    import math

    from dump1090_stream_parser_spark.operators.inference import (
        MODEL_W,
        featurize_docs,
        model_score,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "...!!!"), (4, "the data table")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in model_score(featurize_docs(docs)).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert r["score"] is not None and not math.isnan(r["score"])
        assert r["keep"] is not None
    # empty text: all ratios 0 -> score = squash(bias + w2*0) = squash(-1)
    b = MODEL_W[0]
    assert abs(rows[1]["score"] - b / (1 + abs(b))) < 1e-12
