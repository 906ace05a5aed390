"""Composite pipeline query: the whole training-data funnel as ONE
declarative job.

Every stage below exists as its own oracle-verified operator; this
module proves they COMPOSE -- the real shape of a curation run is
filter -> dedup -> decontaminate -> split in one lineage, where Catalyst
gets to pipeline the narrow stages and share scans, instead of four
jobs materializing intermediates. The funnel report (per-stage survivor
counts) is also the artifact a data team actually reviews before a
training run.

Stage rules reuse the exact constants of their standalone operators, so
the composite's oracle is assembled from the same fragments:

- model filter: ``inference.q_model_score``'s classifier keep rule;
- dedup: ``dedup.q_dedup_best``'s normalized fingerprint, one survivor
  per family (membership, not representative, decides counts);
- decontamination: ``pipeline_ops.q_contamination``'s word-4-gram
  overlap against the eval split (survivors sharing ANY gram with eval
  are dropped -- the scrub form of the audit);
- split: ``text.q_train_split``'s stable hash buckets.

Registration: tail (rationale in operators/__init__.py) -- every
capability is held in-window by its standalone operator; this entry
pins the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import load_table
from .dedup import _NORM_FP_SQL
from .inference import (
    MODEL_KEEP_THRESHOLD,
    MODEL_W,
    _STOP_IN,
    model_score_expr,
)
from .pipeline_ops import _EVAL_GE, _TRAIN_LT, CONTAM_K, contam_grams_array
from .registry import query
from .text import SPLIT_PCT, tokens_col

_W0, _W1, _W2, _W3 = MODEL_W


@query(
    "q_pipeline_funnel",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             ({portable_hash64_sql("doc_id")}) % 100 AS bucket,
             {_NORM_FP_SQL} AS fingerprint,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks,
             (({_W0})
              + ({_W1}) * (CASE WHEN len(list_filter(string_split(text, ' '),
                                t -> t <> '')) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ({_STOP_IN}))) AS DOUBLE)
                        / len(list_filter(string_split(text, ' '),
                              t -> t <> ''))
                   END)
              + ({_W2}) * (least(len(list_filter(string_split(text, ' '),
                                t -> t <> '')), 100) / 100.0)
              + ({_W3}) * (CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(text) - length(regexp_replace(text,
                            '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                        / length(text)
                   END)) AS z
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE z / (1 + abs(z)) >= {MODEL_KEEP_THRESHOLD}
    ),
    deduped AS (
      SELECT * FROM kept
      WHERE doc_id IN (
        SELECT arg_min(doc_id, doc_id) FROM kept GROUP BY fingerprint
      )
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(list_transform(
               generate_series(1, len(toks) - {CONTAM_K} + 1),
               i -> {portable_hash64_sql(
                   f"array_to_string(toks[i:i+{CONTAM_K}-1], ' ')"
               )})) AS gh
      FROM scored WHERE bucket >= {_EVAL_GE}
    ),
    contaminated AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - {CONTAM_K} + 1),
                 i -> {portable_hash64_sql(
                     f"array_to_string(toks[i:i+{CONTAM_K}-1], ' ')"
                 )})) AS gh
        FROM deduped WHERE bucket < {_TRAIN_LT}
      ) g WHERE gh IN (SELECT gh FROM eval_grams)
    ),
    clean AS (
      SELECT * FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    funnel AS (
      SELECT 0 AS stage_no, 'input' AS stage,
             COUNT(*) AS n_docs FROM scored
      UNION ALL
      SELECT 1, 'model_keep', COUNT(*) FROM kept
      UNION ALL
      SELECT 2, 'deduped', COUNT(*) FROM deduped
      UNION ALL
      SELECT 3, 'decontaminated', COUNT(*) FROM clean
      UNION ALL
      SELECT 4, 'final_train', COUNT(*) FROM clean
      WHERE bucket < {SPLIT_PCT[0]}
    )
    SELECT stage_no, stage, n_docs,
           CAST(n_docs AS DOUBLE)
             / (SELECT COUNT(*) FROM scored) AS pct_of_input
    FROM funnel
    ORDER BY stage_no
    """,
)
def q_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts for the composed curation pipeline:
    input -> classifier filter -> exact dedup (normalized fingerprint,
    min-id survivor) -> eval-decontamination scrub -> train split.

    One lineage, one job: the scoring/fingerprint/bucket columns come
    from a single staged projection of the scan; dedup-survivor
    membership is a fingerprint-keyed min (8-byte shuffle); the scrub
    is the contamination semi-join restricted to dedup survivors. The
    funnel rows themselves are 1-row aggregates unioned -- a
    driver-artifact-sized result at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    # every stage column comes from its standalone operator's shared
    # builder, so the composite cannot drift from the stages it pins
    norm = F.lower(
        F.trim(F.regexp_replace(F.col("text"), "[ \\t\\n\\f\\r]+", " "))
    )
    staged = docs.select(
        "doc_id",
        (portable_hash64(F.col("doc_id")) % 100).alias("bucket"),
        portable_hash64(norm).alias("fingerprint"),
        tokens_col().alias("_t"),
        model_score_expr().alias("score"),
    )
    kept = staged.filter(F.col("score") >= MODEL_KEEP_THRESHOLD)
    min_ids = kept.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = kept.join(min_ids.select("doc_id"), "doc_id", "left_semi")

    grams_arr = contam_grams_array(F.col("_t"))
    eval_grams = (
        staged.filter(F.col("bucket") >= _EVAL_GE)
        .select(F.explode(grams_arr).alias("gh"))
        .distinct()
    )
    contaminated = (
        deduped.filter(F.col("bucket") < _TRAIN_LT)
        .select("doc_id", F.explode(grams_arr.alias("_g")).alias("gh"))
        .join(eval_grams, "gh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    def stage(no: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
        ).select("stage_no", "stage", "n_docs")

    funnel = (
        stage(0, "input", staged)
        .unionByName(stage(1, "model_keep", kept))
        .unionByName(stage(2, "deduped", deduped))
        .unionByName(stage(3, "decontaminated", clean))
        .unionByName(
            stage(
                4,
                "final_train",
                clean.filter(F.col("bucket") < SPLIT_PCT[0]),
            )
        )
    )
    total = staged.agg(F.count("*").alias("_total"))
    return (
        funnel.join(F.broadcast(total))
        .select(
            "stage_no",
            "stage",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("_total")).alias(
                "pct_of_input"
            ),
        )
        .orderBy("stage_no")
    )
