"""Tier C extension: record linkage / entity resolution (SURVEY.md §2
north-star "deduplication" adjacency -- the cross-catalog question
"which of these names are the same real-world thing" that exact and
shingle dedup cannot answer because the strings legitimately differ).

The operator family is blocked fuzzy matching: a cheap deterministic
BLOCKING KEY makes candidate generation an equi-join, and the expensive
string distance runs only inside blocks. Two scale decisions mirror the
near-dup tier:

- Join at the DISTINCT-NAME level, not the row level (the q_near_dedup
  simhash precedent: signatures, not documents, ride the self-join).
  Row multiplicity is re-attached as counts -- a pair of names shared
  by thousands of rows is ONE compared pair plus two integers, and the
  row-level expansion (n_a * n_b pairs) is reported, never materialized.
- Recall is a BLOCKING CONTRACT, exactly like LSH banding: a match is
  found iff the pair shares a block. tests/test_linkage.py measures
  block recall against the unblocked all-pairs ground truth at fixture
  scale, the same discipline as the embedding-LSH recall floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

#: Maximum Levenshtein distance for a candidate pair to link.
MAX_EDIT_DISTANCE = 2


@query(
    "q_fuzzy_join",
    oracle=f"""
    WITH names AS (
      SELECT p_name,
             string_split(p_name, ' ')[-1] AS block,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.block AS block,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
           a.n_parts * b.n_parts AS n_row_pairs
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT_DISTANCE}
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join over part names: pairs of DISTINCT names
    within Levenshtein distance 2 that share the head-noun blocking key
    (the last name token), with row multiplicities attached as counts.

    The entity-resolution candidate generator: an equi-join on the
    blocking key prunes the pair space from |names|^2 to sum of
    block^2, and the edit distance -- the expensive part -- runs only
    on co-blocked pairs. Both engines compute standard Levenshtein
    (Spark's levenshtein == DuckDB's levenshtein, integer), so the
    full result hash-compares with no float anywhere.

    Scale shape: the join runs at the distinct-name level (names are
    aggregated with their row counts first -- one hash agg), so row
    multiplicity never rides the pair space; n_row_pairs REPORTS the
    row-level expansion a materializing linker would produce. The
    name table is orders of magnitude smaller than the row table and
    broadcast when it fits; when it doesn't, the equi-join on the
    block key shuffles names once, and block sizes -- not corpus
    size -- bound every task. Low-cardinality natural blocks (8 nouns
    here) are the fixture's skew case; production keys compose more
    selective blocks (noun + length bucket, phonetic key, or multiple
    blocking passes unioned), trading the measured recall exactly as
    LSH banding trades band count for probe cost. Recall contract: a
    pair links iff it shares the block -- measured against unblocked
    all-pairs ground truth in tests/test_linkage.py.
    """
    part = load_table(spark, sf_dir, "part")
    # both self-join sides replay the name aggregate's ONE exchange
    # via ReuseExchange instead of scanning+aggregating part twice
    # (round-13 A/B: identical shuffle records, checkpoint removed)
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= MAX_EDIT_DISTANCE)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.block").alias("block"),
            dist.cast("long").alias("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
            (F.col("a.n_parts") * F.col("b.n_parts")).alias(
                "n_row_pairs"
            ),
        )
    )
