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


# --------------------------------------------------------------------------
# Bitmap (bitset) index over a low-cardinality attribute: each part's
# calendar-month shipping activity packed into a 12-bit integer with a
# bit_or aggregate -- the roaring/bitmap-index primitive that turns
# set-membership questions ("active in January AND July", "covers all
# four quarters") into single bitwise instructions instead of joins or
# array scans. The query then profiles the index itself: which seasonal
# patterns exist and how many parts share each.
# --------------------------------------------------------------------------

#: Quarter masks over the 12-bit month bitmap (bit 0 = January).
_Q1, _Q2, _Q3, _Q4 = 0x007, 0x038, 0x1C0, 0xE00

#: Shared all-quarters predicate over the packed bitmap.
_ALL_QUARTERS = (
    f"(bit_and_q1 > 0 AND bit_and_q2 > 0"
    f" AND bit_and_q3 > 0 AND bit_and_q4 > 0)"
)

#: Number of pattern rows to emit.
TOP_PATTERNS = 50


@query(
    "q_bitmap_index",
    oracle=f"""
    WITH bitmaps AS (
      SELECT l_partkey,
             CAST(bit_or(1 << (month(l_shipdate) - 1)) AS BIGINT)
               AS month_bitmap
      FROM lineitem GROUP BY 1
    ),
    patterns AS (
      SELECT month_bitmap,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(bit_count(month_bitmap) AS INTEGER) AS months_active,
             (month_bitmap & {_Q1}) AS bit_and_q1,
             (month_bitmap & {_Q2}) AS bit_and_q2,
             (month_bitmap & {_Q3}) AS bit_and_q3,
             (month_bitmap & {_Q4}) AS bit_and_q4
      FROM bitmaps GROUP BY 1
    )
    SELECT month_bitmap, n_parts, months_active,
           {_ALL_QUARTERS} AS all_quarters
    FROM patterns
    ORDER BY n_parts DESC, month_bitmap
    LIMIT {TOP_PATTERNS}
    """,
)
def q_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-pattern profile of a per-part month bitmap index: the
    top {TOP_PATTERNS} distinct 12-bit shipping-month bitmaps by part
    count, with each pattern's active-month popcount and an
    all-four-quarters membership flag computed bitwise.

    The bitmap-index primitive: ONE hash aggregation packs every
    part's shipping months into an integer via bit_or(1 << (month-1))
    -- a mergeable aggregate (OR is associative/commutative/
    idempotent), so map-side partials collapse each partition to one
    row per part seen, and re-shipments in the same month cost
    nothing. After packing, membership questions are single bitwise
    instructions (mask AND + popcount), never joins: the second,
    DOMAIN-SIZED aggregation (at most 2^12 distinct patterns,
    regardless of catalog size) profiles the index and evaluates the
    quarter-coverage flags on the packed integers.

    Everything is exact integer arithmetic -- no float policy to
    share; the only cross-engine care is the shift/popcount spelling
    (Spark shiftleft/bit_count vs DuckDB <</bit_count), pinned by the
    parity gate.

    Scale: shuffle 1 carries |parts| rows of (key, 12-bit int);
    shuffle 2 carries at most 4096 pattern rows. This is the same
    "reduce to a packed integer before anything exchanges" discipline
    as the fingerprint dedups, applied to set membership. A true
    roaring bitmap (arbitrary-cardinality domains) swaps the BIGINT
    for chunked bitmaps with the same mergeable-OR algebra.

    tests/test_indexing.py recomputes the pattern table in pure
    Python (third-engine check) and pins popcount/quarter-mask
    consistency.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bitmaps = (
        li.select(
            "l_partkey",
            F.expr("shiftleft(1, month(l_shipdate) - 1)")
            .cast("long")
            .alias("mbit"),
        )
        .groupBy("l_partkey")
        .agg(F.expr("bit_or(mbit)").alias("month_bitmap"))
    )
    patterns = bitmaps.groupBy("month_bitmap").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.bit_count("month_bitmap").cast("int").alias("months_active"),
    )
    flags = patterns.select(
        "month_bitmap",
        "n_parts",
        "months_active",
        (F.col("month_bitmap").bitwiseAND(_Q1)).alias("bit_and_q1"),
        (F.col("month_bitmap").bitwiseAND(_Q2)).alias("bit_and_q2"),
        (F.col("month_bitmap").bitwiseAND(_Q3)).alias("bit_and_q3"),
        (F.col("month_bitmap").bitwiseAND(_Q4)).alias("bit_and_q4"),
    )
    return (
        flags.select(
            "month_bitmap",
            "n_parts",
            "months_active",
            F.expr(_ALL_QUARTERS).alias("all_quarters"),
        )
        .orderBy(F.desc("n_parts"), "month_bitmap")
        .limit(TOP_PATTERNS)
    )
