"""Tier C extension: search-index construction (SURVEY.md §2 north-star
"similarity search" adjacency -- the sparse-retrieval half of the
hybrid stack: q_bm25 SCORES with term statistics, this module BUILDS
the inverted index a production retriever serves those scores from).

The operator materializes delta-encoded posting lists SHARDED BY
DOC-ID RANGE. Sharding is the part that matters at 100 TB: an
unsharded ``groupBy(token)`` sends every stopword's full posting list
(corpus-sized for hot tokens) to one reducer -- the classic index-build
hot-key failure. Grouping on (token, doc_id DIV shard) bounds every
task at the shard width by construction, the per-shard lists
concatenate into the full posting list without re-sorting (shards are
doc-ordered), and the layout IS the block-max index layout retrieval
engines want on disk (per-block heads enable WAND-style block
skipping). Delta gaps, not absolute ids, are what varint/PForDelta
compression consumes -- emitted here so the downstream encoder is a
narrow map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query
from .text import tokens_col

#: Docs per posting shard. Test corpora are small so a width of 256
#: exercises multi-shard tokens at sf0.001; production sizes this to
#: the compression block (e.g. 128k docs) -- the plan is width-agnostic.
SHARD_WIDTH = 256


@query(
    "q_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS token, doc_id
      FROM documents
    ),
    sharded AS (
      SELECT token, doc_id // {SHARD_WIDTH} AS shard, doc_id
      FROM tok WHERE token <> ''
    ),
    lists AS (
      SELECT token, shard,
             CAST(COUNT(*) AS BIGINT) AS df_shard,
             list_sort(list(doc_id)) AS ids
      FROM sharded GROUP BY 1, 2
    )
    SELECT token, shard, df_shard,
           ids[1] AS head_doc,
           array_to_string(list_transform(generate_series(2, len(ids)),
                                          i -> ids[i] - ids[i - 1]),
                           ',') AS gaps
    FROM lists
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-encoded inverted index over the document corpus, sharded
    by doc-id range: one row per (token, shard) holding the shard's
    document frequency, the first doc id, and the ascending gaps
    (comma-joined -- the pre-varint byte form).

    Physical shape: explode tokens -> ONE hash aggregation on
    (token, shard), with collect_set doing the per-posting dedup
    INSIDE the aggregation buffer -- a separate distinct would add a
    second corpus-sized exchange on (token, doc_id) for nothing, and
    the set partials still merge map-side. The hot-key risk lives in
    the group key, which is why it carries the shard: a stopword that
    appears in every document becomes #docs/SHARD_WIDTH bounded rows
    instead of one corpus-sized reducer task, and concatenating a
    token's shards in shard order IS the full sorted posting list (no
    merge pass -- doc-range sharding preserves global order across
    shards). Gaps rather than absolute ids are the form posting-list
    compressors (varint, PForDelta) consume.

    Both engines sort each shard's ids exactly once and emit integer
    arrays, so the driver's value hash covers the encoding end-to-end;
    tests/test_indexing.py additionally reconstructs absolute ids from
    (head_doc, gaps) and checks the round trip against the raw pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(tokens_col()).alias("token"), "doc_id"
    ).withColumn("shard", F.expr(f"doc_id div {SHARD_WIDTH}"))
    lists = pairs.groupBy("token", "shard").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids"),
    ).withColumn("df_shard", F.size("ids").cast("long"))
    n = F.size("ids")
    return lists.select(
        "token",
        "shard",
        "df_shard",
        F.element_at("ids", 1).alias("head_doc"),
        # comma-joined rather than ARRAY<BIGINT>: the driver hash
        # canonicalizes pandas cells, where Spark arrays arrive as
        # Python lists but DuckDB lists arrive as numpy arrays -- the
        # string form hash-compares, and it is also the byte layout a
        # varint encoder consumes next
        F.concat_ws(
            ",",
            F.zip_with(
                F.slice("ids", 2, n - 1),
                F.slice("ids", 1, n - 1),
                lambda a, b: a - b,
            ),
        ).alias("gaps"),
    )
