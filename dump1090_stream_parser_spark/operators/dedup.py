"""Tier C: deduplication operators (SURVEY.md §2.3 C1/C2; north-star
training-data ops: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Everything here is deterministic across engines: the hash family is the
portable md5-based one (functions.hashing), jaccard/hamming are integer
arithmetic with one final division, and every LSH step (signature ->
banding -> candidate join -> verification) is mirrored 1:1 in the DuckDB
oracle SQL, generated from the same constants.

Scale posture (the whole point of LSH at 100 TB):
- exact dedup shuffles 60-bit hashes, never raw documents;
- MinHash: signatures are computed in a narrow map (higher-order
  functions over the token array -- no explode, no shuffle); only the
  (band_idx, band_key) pairs shuffle for the self-join, and candidate
  verification touches only LSH survivors, not all O(n^2) pairs;
- SimHash: one explode + one groupBy per doc; candidate pairs come from
  four 16-bit band joins over the 64-bit signature (hamming<=3 leaves
  one band intact -- pigeonhole), again avoiding all-pairs;
- n-gram Jaccard: the bigram equi-join IS the blocking -- pairs sharing
  zero bigrams are never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31 as P
from ..functions.hashing import (
    portable_hash4_hi,
    portable_hash4_hi_sql,
    portable_hash64,
    portable_hash64_sql,
)
from ..tables import load_table
from .registry import query
from .text import tokens_col

# --------------------------------------------------------------------------
# C1: exact dedup
# --------------------------------------------------------------------------


@query(
    "q_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             {portable_hash64_sql("text")} AS fingerprint
      FROM documents
    )
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies, MIN(source) AS source
    FROM fp
    GROUP BY fingerprint
    """,
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first semantics (C1), keyed on the 60-bit
    content fingerprint: the projection drops ``text`` before the
    groupBy, so the exchange carries an 8-byte hash + (doc_id, source)
    per row instead of the raw document -- at 100 TB that is the
    difference between shuffling kilobytes and shuffling the corpus
    (asserted in tests/test_plans.py). MIN representative keeps the
    choice deterministic, unlike dropDuplicates' arbitrary pick.
    Collision risk at 60 bits is ~n^2/2^61 (~10^-7 at a billion docs);
    a byte-exact pipeline re-checks equality inside each fingerprint
    group, where the text join touches only group members."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            portable_hash64(F.col("text")).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
            F.min("source").alias("source"),
        )
        .drop("fingerprint")
    )


#: Keep-BEST selection is one integer arg-max: score packs
#: (clamped n_chars, -doc_id) as n_chars*2^41 - doc_id. n_chars is
#: clamped to 2^22-1 (4 Mi chars) so the product cannot overflow int64;
#: ties among longer-than-clamp docs fall through to the doc_id
#: tiebreak (documented bound). REQUIRES doc_id < 2^41 (~2.2e12) --
#: snowflake-style 64-bit ids must be densely re-mapped first, or the
#: -doc_id term dominates and selection is silently wrong.
_BEST_CLAMP = (1 << 22) - 1
_BEST_PACK = 1 << 41
#: Explicit whitespace class, NOT \s: Java regex counts \x0B in \s,
#: DuckDB's RE2 does not -- the explicit class is identical in both.
_WS_CLASS = "[ \\t\\n\\f\\r]+"
_NORM_SQL = f"lower(trim(regexp_replace(text, '{_WS_CLASS}', ' ', 'g')))"
_NORM_FP_SQL = portable_hash64_sql(_NORM_SQL)


@query(
    "q_dedup_best",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, n_chars,
             {_NORM_FP_SQL} AS fingerprint
      FROM documents
    )
    SELECT arg_max(doc_id,
                   least(n_chars, {_BEST_CLAMP}) * {_BEST_PACK} - doc_id)
             AS doc_id,
           COUNT(*) AS n_copies,
           MAX(n_chars) AS kept_chars
    FROM fp
    GROUP BY fingerprint
    """,
)
def q_dedup_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-BEST semantics over a NORMALIZED fingerprint
    (lowercased, whitespace-collapsed text): families group docs that
    differ only in case/spacing, and the kept representative is the
    longest raw doc (most formatting preserved), doc_id tiebreak --
    what production pipelines do when copies differ in mojibake or
    truncation. Raw-text fingerprints would make n_chars constant per
    family and reduce this to keep-first; normalization is what makes
    "best" a real choice. Same 8-byte fingerprint-keyed shuffle as
    q_dedup; selection is a single integer arg-max (see _BEST_PACK
    bounds), no second pass over text."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    norm = F.lower(
        F.trim(F.regexp_replace(F.col("text"), "[ \\t\\n\\f\\r]+", " "))
    )
    score = (
        F.least(F.col("n_chars"), F.lit(_BEST_CLAMP)) * _BEST_PACK
        - F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "n_chars",
            portable_hash64(norm).alias("fingerprint"),
            score.alias("_score"),
        )
        .groupBy("fingerprint")
        .agg(
            F.max_by("doc_id", F.col("_score")).alias("doc_id"),
            F.count("*").alias("n_copies"),
            F.max("n_chars").alias("kept_chars"),
        )
        .drop("fingerprint")
    )


@query(
    "q_dedup_events",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           COUNT(*) AS n_occurrences
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-subset dedup over the stream table (C1): one row per
    (user, event type), earliest event kept -- the batch twin of
    streaming dropDuplicatesWithinWatermark."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_occurrences"),
    )


# --------------------------------------------------------------------------
# C1 incremental: snapshot-diff dedup. At 100 TB nobody re-deduplicates
# the whole corpus per crawl -- each new snapshot is classified against
# the previous one's FINGERPRINT set (8 bytes/doc, the only thing that
# needs to persist between runs). Snapshots are carved deterministically
# out of ``documents`` with selectors shared verbatim with the oracle.
# --------------------------------------------------------------------------

#: Snapshot selectors (shared Spark/oracle; evaluated on documents).
_SNAP_PREV_SQL = "doc_id % 10 < 8"  # previous crawl: 80% of ids
_SNAP_CUR_SQL = "doc_id % 10 >= 1"  # current crawl: drops 0, adds 8/9
#: New-id docs that plagiarize their neighbor's content (doc_id-1 is
#: doc_id%10==7, always inside the previous snapshot) -- the cross-doc
#: duplicate an incremental pipeline must still drop. Takes precedence
#: over the edit rule below.
_SNAP_COPIED_SQL = "doc_id % 10 = 8"
_SNAP_CHANGED_SQL = "doc_id % 7 = 0"  # re-crawled docs whose text moved
#: Edit applied to changed docs in the current snapshot.
_SNAP_EDIT_SQL = "text || ' v2'"


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH prev AS (
      SELECT doc_id, {portable_hash64_sql("text")} AS fp
      FROM documents WHERE {_SNAP_PREV_SQL}
    ),
    cur AS (
      SELECT c.doc_id,
             {portable_hash64_sql(
                 f"CASE WHEN ({_SNAP_COPIED_SQL.replace('doc_id', 'c.doc_id')})"
                 " AND nb.text IS NOT NULL THEN nb.text"
                 f" WHEN ({_SNAP_CHANGED_SQL.replace('doc_id', 'c.doc_id')})"
                 f" THEN c.{_SNAP_EDIT_SQL}"
                 " ELSE c.text END"
             )} AS fp
      FROM documents c
      LEFT JOIN documents nb ON nb.doc_id = c.doc_id - 1
      WHERE {_SNAP_CUR_SQL.replace('doc_id', 'c.doc_id')}
    ),
    classified AS (
      SELECT c.doc_id,
             CASE
               WHEN p.doc_id IS NOT NULL AND c.fp = p.fp THEN 'carried'
               WHEN p.doc_id IS NOT NULL THEN 'changed'
               WHEN c.fp IN (SELECT fp FROM prev) THEN 'new_duplicate'
               ELSE 'new_unique'
             END AS status
      FROM cur c LEFT JOIN prev p ON p.doc_id = c.doc_id
    )
    SELECT status, COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM classified GROUP BY status
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot-diff dedup (C1 at pipeline cadence): every
    document of the CURRENT crawl is classified against the PREVIOUS
    crawl as carried (same id, same content), changed (same id, new
    content), new_duplicate (new id, but its content already existed
    somewhere in the previous snapshot -- the cross-doc dup an
    incremental pipeline must still drop; synthesized here as new docs
    that copy their neighbor's text, since this corpus has no natural
    exact duplicates), or new_unique (genuinely new work). Both
    classification joins run on the 60-bit content fingerprint and the
    doc id -- the exchange never carries text, and the only state a
    production run persists between crawls is the previous
    fingerprint set at 8 bytes + id per doc. The id join is an
    equi-LEFT join; the content-carryover check is a match against
    DISTINCT previous fingerprints (IN-subquery in the oracle, a
    left-semi-shaped join here), so both sides stay
    fingerprint-narrow at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    nb = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("nb_text"),
    )
    cur_base = docs.filter(_SNAP_CUR_SQL).join(nb, "doc_id", "left")
    cur_text = F.expr(
        f"CASE WHEN ({_SNAP_COPIED_SQL}) AND nb_text IS NOT NULL"
        " THEN nb_text"
        f" WHEN ({_SNAP_CHANGED_SQL}) THEN {_SNAP_EDIT_SQL}"
        " ELSE text END"
    )
    prev = docs.filter(_SNAP_PREV_SQL).select(
        F.col("doc_id").alias("prev_id"),
        portable_hash64(F.col("text")).alias("prev_fp"),
    )
    cur = cur_base.select(
        "doc_id", portable_hash64(cur_text).alias("fp")
    )
    prev_fps = prev.select(F.col("prev_fp").alias("known_fp")).distinct()
    by_id = cur.join(prev, cur.doc_id == prev.prev_id, "left")
    with_content = by_id.join(
        prev_fps, by_id.fp == prev_fps.known_fp, "left"
    )
    status = (
        F.when(
            F.col("prev_id").isNotNull()
            & (F.col("fp") == F.col("prev_fp")),
            "carried",
        )
        .when(F.col("prev_id").isNotNull(), "changed")
        .when(F.col("known_fp").isNotNull(), "new_duplicate")
        .otherwise("new_unique")
    )
    return (
        with_content.select("doc_id", status.alias("status"))
        .groupBy("status")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# C2a: MinHash + LSH banding near-dup over word-BIGRAM shingles.
# k=12 hashes, 4 bands x 3 rows => candidate threshold ~(1/4)^(1/3)=0.63;
# verification keeps exact shingle-set jaccard >= 0.5.
#
# Shingles, not unigram token sets: with a small shared vocabulary every
# pair of documents has high token-set jaccard (median 0.62 in this
# corpus), which degenerates LSH into all-pairs -- the bench showed the
# candidate verify dominating the whole suite. Order-sensitive shingles
# restore the selectivity LSH needs; that IS the algorithm working as
# designed, and it's why shingling is standard in near-dup pipelines.
# --------------------------------------------------------------------------

MINHASH_A = (7, 13, 31, 61, 127, 251, 509, 1021, 2039, 4093, 8191, 16381)
MINHASH_B = (3, 17, 29, 87, 151, 321, 641, 1283, 2567, 5131, 10259, 20521)
N_BANDS, ROWS_PER_BAND = 4, 3
JACCARD_THRESHOLD = 0.5


def _minhash_fn(a: int, b: int):
    # Single-arg closure: PySpark derives lambda arity from the Python
    # signature, so default-arg capture would read as a 3-arg lambda.
    # Operates on the pre-computed base hash array: md5 runs ONCE per
    # token, not once per hash-family member (12x less hashing).
    return lambda h: (F.lit(a) * h + F.lit(b)) % P


def _minhash_sig_cols() -> list[F.Column]:
    return [
        F.array_min(F.transform("hs", _minhash_fn(a, b))).alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def _minhash_pairs_ctes() -> str:
    """CTE chain ending in ``pairs(doc_id_1, doc_id_2, jaccard)`` -- the
    verified minhash/LSH survivor set. Shared by the q_near_dedup_minhash
    oracle and the q_dedup_clusters_lsh oracle so both engines close the
    SAME graph."""
    h = portable_hash64_sql("s")
    sig_exprs = ",\n      ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P})) AS m{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, concat_ws(','"
        + "".join(
            f", m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        + ") AS band_key FROM sig"
        for b in range(N_BANDS)
    )
    return f"""toks AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1])) AS ts
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ts, list_transform(ts, s -> ({h}) % {P}) AS hs
      FROM toks
    ),
    sig AS (
      SELECT doc_id,
      {sig_exprs}
      FROM hashed
    ),
    bands AS (
      {band_selects}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_id_1, c.doc_id_2,
             len(list_filter(t1.ts, x -> list_contains(t2.ts, x)))
               AS n_inter,
             len(t1.ts) AS sz1, len(t2.ts) AS sz2
      FROM cand c
      JOIN toks t1 ON t1.doc_id = c.doc_id_1
      JOIN toks t2 ON t2.doc_id = c.doc_id_2
    ),
    pairs AS (
      SELECT doc_id_1, doc_id_2,
             CAST(n_inter AS DOUBLE) / (sz1 + sz2 - n_inter) AS jaccard
      FROM verified
      WHERE CAST(n_inter AS DOUBLE) / (sz1 + sz2 - n_inter)
            >= {JACCARD_THRESHOLD}
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_pairs_ctes()}
    SELECT doc_id_1, doc_id_2, jaccard FROM pairs
    """


def minhash_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, ts: distinct bigram shingle array) -- narrow map.

    The token array is staged once (size + two slices reference it;
    staging keeps the split-and-filter to one evaluation per row)."""
    staged = docs.select("doc_id", tokens_col().alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    return staged.select("doc_id", shingles.alias("ts"))


def minhash_bands(toks: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) LSH band rows from the shingle
    table -- still a narrow map (signature via higher-order array ops,
    band fan-out via ONE generator over the band-struct array). Works
    identically on batch and streaming inputs, which is what lets the
    streaming near-dup detector (streaming/near_dup.py) share the exact
    banding semantics of q_near_dedup_minhash.

    Round 13 (guide §2.4 "remove duplicated subtrees"): the band
    fan-out used to be a UNION of N_BANDS projections of ``sig``.
    Union branches are independent physical subtrees, so the whole
    shingle -> md5 -> 12-permutation signature map re-executed once
    PER BAND -- and the band self-join evaluates both sides (broadcast
    build defeats ReuseExchange), so the corpus was tokenized and
    md5-hashed 8x per run (plans/r13/q_near_dedup_minhash_before.txt:
    8 documents scans under the two Unions). Exploding an array of
    (band_idx, band_key) structs emits the identical rows from ONE
    evaluation of the signature subtree per join side: 10 -> 4
    documents scans, 3.64 -> measured after-number in
    OPTIMIZATION_r13.md, identical output (same oracle)."""
    hashed = toks.select(
        "doc_id",
        F.transform("ts", lambda s: portable_hash64(s) % P).alias("hs"),
    )
    sig = hashed.select("doc_id", *_minhash_sig_cols())

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",",
                    *[
                        f"m{b * ROWS_PER_BAND + r}"
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("g")).select(
        "doc_id",
        F.col("g.band_idx").alias("band_idx"),
        F.col("g.band_key").alias("band_key"),
    )


@query("q_near_dedup_minhash", oracle=_minhash_oracle())
def q_near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH-banding near-dup (C2): bigram shingles and the
    signature in a narrow map, candidates from a band-key self-join,
    exact jaccard verify on survivors only."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = minhash_shingles(docs)
    bands = minhash_bands(toks)

    # shuffle_hash, not broadcast, for the band self-join: both sides
    # are the IDENTICAL signature subtree, so a shuffle-based join lets
    # ReuseExchange evaluate the shingle->md5->signature map ONCE and
    # replay the exchange for the other side -- a broadcast build side
    # re-executes it (guide §2.4; plans/r13/*_before vs *_after: 2
    # signature subtrees -> 1 + ReusedExchange). The band-row exchange
    # itself carries 3 small columns, which is exactly the cheap side
    # of that trade at any scale.
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.hint("shuffle_hash").join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )

    # Verify with set-intersection on the token ARRAYS joined per pair --
    # never an exploded token x token join (that shape is O(pairs x
    # tokens) rows through a shuffle and dominated the first bench run).
    # Plain equi-joins, not broadcast: both joins hash-partition toks by
    # doc_id, so ReuseExchange shingles the corpus once, and no executor
    # ever holds every document's shingle set (broadcasting toks would
    # cap scale at driver memory; candidates, not docs, are the small
    # side -- AQE broadcasts them at runtime when they fit).
    t1 = toks.select(
        F.col("doc_id").alias("doc_id_1"), F.col("ts").alias("ts1")
    )
    t2 = toks.select(
        F.col("doc_id").alias("doc_id_2"), F.col("ts").alias("ts2")
    )
    pairs = cand.join(t1, "doc_id_1").join(t2, "doc_id_2")
    n_inter = F.size(F.array_intersect("ts1", "ts2"))
    jac = pairs.select(
        "doc_id_1",
        "doc_id_2",
        (
            n_inter.cast("double")
            / (F.size("ts1") + F.size("ts2") - n_inter)
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# --------------------------------------------------------------------------
# C2b: SimHash near-dup -- 64-bit signature, 4 x 16-bit bands, hamming<=3
# (the production-scale shape: web-dedup uses exactly 64-bit simhash with
# banded hamming search). The 64 bits come from one md5 per distinct
# token: 60 from the portable hash + 4 from hex digit 16. The signature
# is carried as its four 16-bit band keys k0..k3 -- banding and per-band
# xor/bit_count need exactly that form, and it avoids packing bit 63 into
# a signed 64-bit value; a bias-packed `sig` scalar gives identity and a
# total order for pair canonicalization.
# --------------------------------------------------------------------------

SIMHASH_BITS = 64
SIM_BAND_BITS = 16
N_SIM_BANDS = SIMHASH_BITS // SIM_BAND_BITS
HAMMING_MAX = 3

# bias-packed signature: fits signed 64, monotonic in (k3,k2,k1,k0);
# BIGINT casts because DuckDB evaluates the band-key CASE sums as INT32
_SIG_SQL = (
    f"((CAST(k3 AS BIGINT) - {1 << 15}) * {1 << 48})"
    f" + (CAST(k2 AS BIGINT) * {1 << 32})"
    f" + (CAST(k1 AS BIGINT) * {1 << 16}) + CAST(k0 AS BIGINT)"
)


def _sim_bit_sql(j: int) -> str:
    """SQL for signature bit j of a (th, th2) hashed token row."""
    if j < 60:
        return f"((th >> {j}) & 1)"
    return f"((th2 >> {j - 60}) & 1)"


def _simhash_oracle() -> str:
    bit_sums = ",\n      ".join(
        f"SUM(CASE WHEN {_sim_bit_sql(j)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    band_keys = ",\n      ".join(
        "("
        + " + ".join(
            f"(CASE WHEN s{SIM_BAND_BITS * b + r} > 0"
            f" THEN {1 << r} ELSE 0 END)"
            for r in range(SIM_BAND_BITS)
        )
        + f") AS k{b}"
        for b in range(N_SIM_BANDS)
    )
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, k0, k1, k2, k3, {b} AS band_idx, k{b} AS band_key"
        " FROM sim"
        for b in range(N_SIM_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.k{b}, b.k{b}))" for b in range(N_SIM_BANDS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             {portable_hash64_sql("token")} AS th,
             {portable_hash4_hi_sql("token")} AS th2
      FROM tok WHERE token <> ''
    ),
    sums AS (
      SELECT doc_id,
      {bit_sums}
      FROM hashed
      GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id,
      {band_keys}
      FROM sums
    ),
    bands AS (
      {band_selects}
    )
    SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           {ham} AS hamming
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    WHERE {ham} <= {HAMMING_MAX}
    """


@query("q_near_dedup_simhash", oracle=_simhash_oracle())
def q_near_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (C2): 64-bit signature from weighted token-hash
    bit votes; hamming<=3 pairs via 4 x 16-bit banding (pigeonhole: <=3
    flipped bits leave one band intact), so no all-pairs comparison.

    Round 1 shipped 16 bits with a distinct-signature rewrite (16-bit
    signatures collide massively, so doc-level banding was output-bound).
    At 64 bits distinct signatures ~= distinct docs, so banding runs at
    DOC level: the band explode is a narrow 4x map off one aggregation,
    the self-join's two sides are identical subtrees (one exchange,
    reused -- the expensive vote aggregation runs ONCE), and no
    expansion joins are needed afterwards. Each band join buckets on a
    16-bit key: <= 65536 buckets regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Votes sum +-1 per token OCCURRENCE, straight off the explode --
    # no (doc, token) pre-aggregation. A doc's exploded tokens stay in
    # one input partition, so the partial aggregate collapses each doc
    # to a single 64-column row map-side and only ~|docs| rows cross
    # the one exchange; the pre-agg alternative ships the (doc, token,
    # n) pairs through an extra token-level shuffle first (measured
    # ~20% slower at sf0.1, and strictly more network at 100 TB). md5
    # per occurrence instead of per distinct token is map-side-parallel
    # arithmetic -- cheaper than the exchange it replaces.
    tok = docs.select(
        "doc_id", F.explode(tokens_col()).alias("token")
    ).select(
        "doc_id",
        portable_hash64(F.col("token")).alias("th"),
        portable_hash4_hi(F.col("token")).alias("th2"),
    )

    # Each column arrives as ONE parsed expression string: building the
    # 64 vote sums and 4 band keys out of F.when/F.col fragments costs
    # a py4j round trip per fragment -- measured 0.8 s of plan-BUILD
    # time per call (half of it in band_key alone), which the bench and
    # driver pay on every rebuild. The parsed text is the same SQL the
    # oracle embeds, so the expression trees are unchanged.
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN {_sim_bit_sql(j)} = 1 THEN 1 ELSE -1 END)"
            f" AS s{j}"
        )
        for j in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)

    def band_key(b: int) -> F.Column:
        terms = " + ".join(
            f"(CASE WHEN s{SIM_BAND_BITS * b + r} > 0"
            f" THEN {1 << r} ELSE 0 END)"
            for r in range(SIM_BAND_BITS)
        )
        return F.expr(f"CAST({terms} AS BIGINT) AS k{b}")

    sim = sums.select(
        "doc_id", *[band_key(b) for b in range(N_SIM_BANDS)]
    )

    # One posexplode pass generates all 4 band rows -- a narrow map, so
    # `sim` (and the vote aggregation above it) is a single subtree that
    # both join sides share: Spark plans one exchange and reuses it.
    bands = sim.select(
        "doc_id",
        "k0",
        "k1",
        "k2",
        "k3",
        F.posexplode(F.array(*[f"k{b}" for b in range(N_SIM_BANDS)])).alias(
            "band_idx", "band_key"
        ),
    )
    # shuffle_hash, not broadcast: broadcasting the small side would
    # rebuild the whole vote-aggregation lineage for the build side,
    # doubling the expensive stage; with both sides shuffled the two
    # identical subtrees share one exchange (measured 2x faster here,
    # and at 100 TB the bands relation is too big to broadcast anyway).
    a, b = bands.alias("a"), bands.alias("b").hint("shuffle_hash")
    ham = None
    for i in range(N_SIM_BANDS):
        term = F.bit_count(F.expr(f"a.k{i} ^ b.k{i}"))
        ham = term if ham is None else ham + term
    # A pair matching in m bands appears m times -> DISTINCT after the
    # hamming cut, when at most 4x the final pair count remains.
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


# --------------------------------------------------------------------------
# C2c: word-bigram Jaccard near-dup (blocked all-pairs via bigram join).
# --------------------------------------------------------------------------

NGRAM_JACCARD_THRESHOLD = 0.08

#: Shared oracle CTE chain producing the verified bigram-Jaccard pairs
#: (doc_id_1 < doc_id_2, jaccard >= threshold). Used by both
#: q_near_dedup_ngram (which returns the pairs) and q_dedup_clusters
#: (which treats them as graph edges).
_NGRAM_PAIRS_CTES = f"""
    grams AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1])) AS gs
      FROM documents
    ),
    gx AS (SELECT doc_id, lang, unnest(gs) AS gram FROM grams),
    sizes AS (SELECT doc_id, len(gs) AS sz FROM grams),
    inter AS (
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS n_inter
      FROM gx a JOIN gx b
        ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY doc_id_1, doc_id_2
    ),
    pairs AS (
      SELECT i.doc_id_1, i.doc_id_2,
             CAST(n_inter AS DOUBLE) / (s1.sz + s2.sz - n_inter) AS jaccard
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.doc_id_1
      JOIN sizes s2 ON s2.doc_id = i.doc_id_2
      WHERE CAST(n_inter AS DOUBLE) / (s1.sz + s2.sz - n_inter)
            >= {NGRAM_JACCARD_THRESHOLD}
    )"""


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Verified near-dup pairs ``(doc_id_1 < doc_id_2, jaccard)`` via the
    blocked word-bigram Jaccard join (the Spark twin of
    ``_NGRAM_PAIRS_CTES``)."""
    # slice+zip_with, not element_at-per-index: the token array would be
    # re-evaluated per element inside a transform lambda (O(n^2)); and
    # the array itself is staged so its three references cost one split.
    staged = docs.select("doc_id", "lang", tokens_col().alias("_t"))
    toks = F.col("_t")
    n = F.size(toks)
    grams = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    g = staged.select("doc_id", "lang", grams.alias("gs"))
    # Round 14 note (measured, kept as the JOIN shape): the round-13
    # basket_pair_counts recipe (collect_set per gram + sorted-array
    # pair explode) was tried here and measured 3.6x SLOWER
    # (same-session min-of-4: 18.1 s vs 5.0 s at sf0.1/local[32]).
    # Baskets are <= 7 items; gram doc-frequencies reach ~150, so the
    # per-row flatten(transform(slice...)) builds O(df^2) struct
    # arrays inside one codegen expression, far costlier than
    # streaming the same 9.4M pairs through the hash join below.
    gx = g.select("doc_id", "lang", F.explode("gs").alias("gram"))
    sizes = g.select("doc_id", F.size("gs").alias("sz"))
    inter = (
        gx.alias("a")
        .join(
            gx.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.alias("s1"), F.col("s1.doc_id") == F.col("doc_id_1")
        )
        .join(sizes.alias("s2"), F.col("s2.doc_id") == F.col("doc_id_2"))
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.col("n_inter").cast("double")
                / (F.col("s1.sz") + F.col("s2.sz") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
    )


@query(
    "q_near_dedup_ngram",
    oracle=f"""
    WITH {_NGRAM_PAIRS_CTES}
    SELECT doc_id_1, doc_id_2, jaccard FROM pairs
    """,
)
def q_near_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard near-dup within language blocks (C2). The
    bigram equi-join is the blocking step: disjoint pairs never appear.

    Scale honesty: this is the EXACT method -- its cost is the number of
    co-gram pairs, and a low threshold (0.08 here) defeats prefix
    filtering (the prunable prefix shrinks to ~nothing as t -> 0). It is
    the verification-grade tool; at corpus scale the probabilistic
    operators (q_near_dedup_minhash / _simhash) are the first pass and
    this runs only on their survivors."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents", spread=True)
    )


# --------------------------------------------------------------------------
# C2e: dedup clustering -- connected components over the near-dup graph.
# --------------------------------------------------------------------------

#: Iteration cap for label propagation. With pointer jumping the round
#: count is O(log |V|) (~5 observed on this corpus, 12 without jumps);
#: the cap is a runaway guard, not a tuning knob.
CC_MAX_ITERS = 25


def dedup_clusters_from(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Connected-components cluster assignment over an ARBITRARY verified
    near-dup pair set -- the composition point that makes clustering
    scale-safe: feed it the survivors of any blocking pass
    (``q_near_dedup_minhash`` / ``_simhash`` / ``_embedding``) instead of
    an exact all-pairs join. ``pairs`` needs columns (doc_id_1,
    doc_id_2); ``docs`` supplies the node universe so edge-less
    documents come back as singleton clusters.

    Iterative min-label propagation with POINTER JUMPING (label <- min
    of own label, neighbors' labels, and label's label), the classic
    O(log V)-round MapReduce CC recipe -- plain propagation needs
    diameter rounds (12 measured here; 5 with jumps). Each round is two
    equi-joins + one groupBy over (node, label) pairs -- 16-byte rows
    regardless of document size, hash-partitioned on node id; the
    driver only ever sees a per-round label-sum scalar, never data.
    ``localCheckpoint`` truncates the growing lineage each round (on a
    cluster: ``checkpoint`` to HDFS); the loop is how GraphX/GraphFrames
    run the same algorithm."""
    # Materialize the verified pair set ONCE -- the symmetric edge union
    # below references it twice, and without the checkpoint each branch
    # would re-run the (potentially expensive) pair build.
    pairs = pairs.select("doc_id_1", "doc_id_2").localCheckpoint(eager=True)
    # Hash-partition the static edge table on its join key ONCE and
    # checkpoint the partitioned layout (round 14, guide §2.4): every
    # propagation round joins edges on dst, and exchange reuse cannot
    # cross the per-round actions, so the un-partitioned union used to
    # re-exchange the edge set every round. checkpoint_partitioned
    # (tables.py) keeps the hashpartitioning visible on the
    # checkpointed RDD -- a plain AQE-era localCheckpoint records
    # UnknownPartitioning and every round would re-exchange anyway.
    from ..tables import checkpoint_partitioned, loop_partitions

    # Loop width derived from the MEASURED edge count (the count scans
    # the already-materialized pair checkpoint -- milliseconds), not
    # from defaultParallelism: the label table is 16-byte rows, and a
    # cores-wide pin made every toy-scale round ~2.4 s of scheduling
    # over ~80 KB of state (round 14; see tables.loop_partitions).
    npart = loop_partitions(pairs.sparkSession, 2 * pairs.count())
    edges = checkpoint_partitioned(
        pairs.select(
            F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
        ).union(
            pairs.select(
                F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst")
            )
        ),
        npart,
        "dst",
    )
    # Singletons (no incident edge) never move: iterate only over nodes
    # that occur in the edge set; everyone else clusters with themselves.
    # Lazy for the same one-job-per-materialization reason as the loop
    # below: the initial label-sum collect is the first action.
    lab = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )

    def jump(df: DataFrame) -> DataFrame:
        ptr = df.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        return df.join(ptr, df["label"] == ptr["pnode"], "left").select(
            df["node"].alias("node"),
            F.least(df["label"], F.coalesce(ptr["plabel"], df["label"])).alias(
                "label"
            ),
        )

    # Convergence probe: labels only ever decrease, so the label sum is
    # strictly monotone until the fixpoint -- one narrow aggregate over
    # the checkpointed table instead of a join + count per round.
    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]

    prev_sum = label_sum(lab)
    for _ in range(CC_MAX_ITERS):
        nmin = (
            edges.join(lab, edges["dst"] == lab["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        cand = lab.join(nmin, lab["node"] == nmin["src"], "left").select(
            lab["node"].alias("node"),
            F.least(
                lab["label"], F.coalesce(nmin["nmin"], lab["label"])
            ).alias("label"),
        )
        # Two pointer jumps per round halve the remaining rounds: each
        # is a self-join on the (node, label) table, trivial next to the
        # round's fixed job overhead.
        # LAZY checkpoint (round 14): the convergence collect right
        # below is the round's first action and materializes the
        # checkpoint as it runs -- one Spark job per round instead of
        # the former two (eager checkpoint job + collect job), halving
        # the per-round driver scheduling this loop's wall-clock is
        # made of at toy scale.
        new = jump(jump(cand)).localCheckpoint(eager=False)
        cur_sum = label_sum(new)
        lab = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    # Re-attach singleton documents as their own clusters.
    allnodes = docs.select(F.col("doc_id").alias("node"))
    full = allnodes.join(lab, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("label")
    )
    sizes = full.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return full.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.col("cluster_size"),
    )


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_NGRAM_PAIRS_CTES},
    edges AS (
      SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
      UNION ALL
      SELECT doc_id_2 AS a, doc_id_1 AS b FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, r.r AS r FROM edges e JOIN reach r ON r.id = e.b
    ),
    clusters AS (
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size
    FROM clusters
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment (C2): connected components over the
    verified bigram-Jaccard pair graph. Every document gets
    ``cluster_id`` = the smallest doc_id reachable through near-dup
    edges (singletons cluster with themselves), which is exactly what a
    training pipeline needs to keep one canonical representative per
    duplicate family instead of dropping pairs one at a time.

    This is the VERIFICATION-GRADE variant: the edge build is the exact
    bigram-blocked Jaccard join (same plan as q_near_dedup_ngram), whose
    cost is the co-gram pair count -- at corpus scale use
    q_dedup_clusters_lsh, the same CC core over LSH survivors. The CC
    loop itself lives in :func:`dedup_clusters_from` (see its docstring
    for the pointer-jumping shape); the oracle closes the graph with a
    recursive CTE over the identical pair set."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return dedup_clusters_from(docs, ngram_jaccard_pairs(docs))


@query(
    "q_dedup_clusters_lsh",
    oracle=f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    edges AS (
      SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
      UNION ALL
      SELECT doc_id_2 AS a, doc_id_1 AS b FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, r.r AS r FROM edges e JOIN reach r ON r.id = e.b
    ),
    clusters AS (
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size
    FROM clusters
    """,
)
def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering at SCALE (C2): the same connected-components
    core as q_dedup_clusters, but the edge set is the verified
    MinHash+LSH survivor pairs (q_near_dedup_minhash) instead of the
    exact all-co-gram join -- the composition a 100 TB pipeline actually
    runs. Edge-build cost is the LSH candidate count (band-key
    collisions), not the corpus pair count; everything downstream of
    the pair set is (node, label) propagation, document-size-free.
    The oracle closes the same survivor graph with a recursive CTE, so
    cluster assignments are value-checked end to end."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return dedup_clusters_from(docs, q_near_dedup_minhash(spark, sf_dir))


# --------------------------------------------------------------------------
# Exact duplicated-substring spans (C1/C2 bridge): the token-level
# exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
# Data Makes Language Models Better"), approximated at K-token-gram
# granularity -- their suffix-array pass finds byte spans shared
# between documents; here every K-gram shared by >= 2 distinct docs is
# a duplicated position, and maximal runs of duplicated positions merge
# into spans with the gaps-and-islands trick. Doc-level dedup (q_dedup*)
# misses partial overlap (boilerplate headers, quoted passages); this
# finds the overlapping REGION itself, which is what a curation
# pipeline actually cuts.
# --------------------------------------------------------------------------

#: Tokens per duplicated-substring gram. 5 keeps incidental word-level
#: collisions out while real boilerplate (>= 5 shared tokens) registers.
SPAN_GRAM = 5

#: Shared by q_dup_spans and q_dup_spans_bloom: the Bloom prefilter is
#: a plan-shape fork with the identical answer, so both certify
#: against one oracle text (the q_contamination/_bloom precedent).
_DUP_SPANS_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(range(0, len(t) - 4)) AS pos,
             unnest(list_transform(
               range(0, len(t) - 4),
               i -> CAST('0x' || substring(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15) AS BIGINT)
             )) AS ghash
      FROM toks WHERE len(t) >= 5
    ),
    dup AS (
      SELECT ghash FROM grams
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    islands AS (
      SELECT g.doc_id, g.pos,
             g.pos - row_number() OVER (
               PARTITION BY g.doc_id ORDER BY g.pos
             ) AS isl
      FROM grams g JOIN dup ON dup.ghash = g.ghash
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 5 - MIN(pos) AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM islands GROUP BY doc_id, isl
    """


@query("q_dup_spans", oracle=_DUP_SPANS_ORACLE)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans: every run of
    positions whose SPAN_GRAM-token gram also appears in at least one
    OTHER document, merged per document into (span_start, span_end)
    token intervals with the covering gram count.

    The Lee et al. 2022 exact-substring dedup recipe re-expressed
    relationally: (1) positional grams are built ARRAY-SIDE per row
    (transform over an index sequence -- the q_ngram_top shape, no
    positional self-join) and immediately reduced to the portable
    60-bit hash, so the explode and every later exchange carry
    (doc_id, pos, hash) rows, never text; (2) SINGLE-PASS duplicate
    marking (round 10): "appears in >= 2 distinct docs" is exactly
    min(doc_id) != max(doc_id) over the ghash window partition, so one
    exchange on the gram hash marks every duplicated position -- the
    r9 form aggregated the dup-gram set and joined it back, which
    re-ran the gram explode for BOTH sides (narrow maps have no
    exchange for AQE to reuse; stage-meter-measured) and paid a second
    corpus-sized exchange; the rewrite is 2.2x at sf0.1 (2.84 ->
    1.27 s) with identical spans; (3) gaps-and-islands (pos minus
    per-doc rank) merges adjacent positions into maximal spans with
    one doc-keyed window pass. Overlapping grams chain: a 12-token
    copied passage yields 8 consecutive duplicated positions and comes
    out as ONE span of span_tokens = 12.

    Scale: gram construction is a narrow map; text never rides a
    shuffle (the q_dedup/q_contamination fingerprint discipline); the
    per-doc island window partitions on doc_id -- bounded by document
    length, never corpus size. A mega-hot gram makes one hot window
    partition, but min/max need no sort beyond the partition hash and
    process it in one linear task -- the same exposure the r9 form's
    hash-keyed join had on the same key. The round-10 spansweep
    re-measure makes this windowed form the at-scale recommendation
    outright: one exchange of the gram stream beats the Bloom fork's
    total (whose bitmap BUILD itself aggregates the full stream --
    exact 7.7 s / 18.8M shuffled rows vs bloom 17.5 s / 37.8M at x16,
    docs/SCALE.md round-10 table); the Bloom prefilter's real niche
    is a filter set built from a DIFFERENT, smaller corpus (the
    contamination gate), not self-dedup.

    tests/test_dup_spans.py recomputes spans in pure Python at
    sf0.001 (third-engine check) and pins the chaining invariant
    (span_tokens == n_grams + SPAN_GRAM - 1).
    """
    from pyspark.sql.window import Window

    grams = span_grams(load_table(spark, sf_dir, "documents", spread=True))
    w = Window.partitionBy("ghash")
    marked = (
        grams.withColumn("d_lo", F.min("doc_id").over(w))
        .withColumn("d_hi", F.max("doc_id").over(w))
        .filter(F.col("d_lo") != F.col("d_hi"))
        .select("doc_id", "pos")
    )
    return spans_from_marked(marked)


def span_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, ghash) positional SPAN_GRAM-token gram hashes --
    the narrow-map front end shared by q_dup_spans, its Bloom fork,
    and the spansweep probe. Text is reduced to the portable 60-bit
    hash BEFORE the explode leaves the row, so no exchange ever
    carries document text."""
    staged = docs.select("doc_id", tokens_col().alias("t")).filter(
        F.size("t") >= SPAN_GRAM
    )
    gram_structs = F.expr(
        "transform(sequence(0, size(t) - 5),"
        " i -> struct(i AS pos,"
        " concat_ws(' ', slice(t, i + 1, 5)) AS gram))"
    )
    return staged.select(
        "doc_id", F.explode(gram_structs).alias("g")
    ).select(
        "doc_id",
        F.col("g.pos").cast("long").alias("pos"),
        portable_hash64(F.col("g.gram")).alias("ghash"),
    )


def _dup_gram_set(grams: DataFrame) -> DataFrame:
    """Gram hashes shared by >= 2 distinct documents (one mergeable
    aggregation keyed on the hash)."""
    return (
        grams.groupBy("ghash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ghash")
    )


def spans_from_marked(marked: DataFrame) -> DataFrame:
    """Gaps-and-islands tail: merge duplicated positions into maximal
    spans with one doc-keyed window pass (bounded by document length,
    never corpus size)."""
    from pyspark.sql.window import Window

    isl = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    return (
        marked.withColumn("isl", isl)
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (SPAN_GRAM - 1)).alias("span_end"),
            (F.max("pos") + SPAN_GRAM - F.min("pos")).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("isl")
    )


@query("q_dup_spans_bloom", oracle=_DUP_SPANS_ORACLE)
def q_dup_spans_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span detection with a Bloom-prefiltered dup-side
    join -- same exact answer as q_dup_spans (shared oracle), built
    round 9 to cut the join-back exchange to the duplicated subset
    (VERDICT r8 ask #3).

    How it works: the dup-gram set compresses into the fixed-size
    Bloom bitmap (pipeline_ops' BLOOM_WORDS bit_or machinery,
    byte-identical layout to the contamination gate); the gram stream
    broadcast-joins against it on the word index and bit-tests BEFORE
    the join-back, so only survivors (true duplicated positions + the
    few-percent false positives) ride that exchange. No false
    negatives; the verify join removes false positives; spans are
    bit-identical.

    HISTORICAL STATUS since round 10: against the r9 exact form
    (dup-set aggregation + full-stream join-back) this fork measured a
    33% row / 43% byte shuffle cut. The round-10 exact rewrite
    (windowed min/max marking, ONE exchange of the gram stream)
    changed the race: the bitmap BUILD here still aggregates the full
    gram stream before any prefiltering can pay, so the windowed exact
    form now wins outright (7.7 s / 18.8M shuffled rows vs 17.5 s /
    37.8M at x16, docs/SCALE.md round-10 spansweep). The fork stays
    registered as the Bloom-prefilter capability demonstration over a
    shared oracle; its production niche is the asymmetric case where
    the filter set comes from a DIFFERENT, smaller corpus -- exactly
    q_contamination_bloom, whose crossover argument is unaffected.

    The dup set is lazily localCheckpoint'ed: the bitmap aggregation
    and the verify join both read it, and the checkpoint cuts the
    duplicate gram-aggregation pass (round-13 A/B: removal re-ran the
    gram subtree -- executed records doubled at the pin scale and the
    sf0.1 line went 1.29 -> 1.55 s -- so this one stays; at cluster
    scale prefer reliable checkpoint())."""
    from .pipeline_ops import _bloom_word_bit, bloom_bitmap_from_grams

    grams = span_grams(load_table(spark, sf_dir, "documents", spread=True))
    dup = _dup_gram_set(grams).localCheckpoint(eager=False)
    bloom = bloom_bitmap_from_grams(
        dup.select(F.col("ghash").alias("gh"))
    )
    w, mask = _bloom_word_bit("ghash")
    survivors = (
        grams.select(
            "doc_id", "pos", "ghash", w.alias("w"), mask.alias("mask")
        )
        .join(F.broadcast(bloom), "w")
        .filter(F.col("word").bitwiseAND(F.col("mask")) != 0)
        .select("doc_id", "pos", "ghash")
    )
    # INNER against the distinct dup set, not left_semi -- the same
    # PushDownLeftSemiAntiJoin hazard q_contamination_bloom documents:
    # a semi would be pushed below the bloom join the moment dup
    # outgrows the broadcast threshold, resurrecting the full-stream
    # shuffle the bitmap exists to remove. dup is DISTINCT on ghash,
    # so the inner join multiplies each survivor by exactly 0 or 1.
    marked = survivors.join(dup, "ghash").select("doc_id", "pos")
    return spans_from_marked(marked)


# --------------------------------------------------------------------------
# Gram novelty: what fraction of each document's SPAN_GRAM-token grams
# appears here FIRST (no lower doc_id contains the gram)? The
# freshness meter of a curation pipeline -- Lee et al.'s observation
# that later near-copies contribute little novel text, turned into a
# per-document score over the same positional-gram front end as
# q_dup_spans (ingestion order stands in for time; swap the MIN key to
# a timestamp for true arrival order).
# --------------------------------------------------------------------------


@query(
    "q_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(0, len(t) - 4),
               i -> CAST('0x' || substring(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15) AS BIGINT)
             )) AS ghash
      FROM toks WHERE len(t) >= 5
    ),
    firsts AS (
      SELECT ghash, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM grams g JOIN firsts f ON f.ghash = g.ghash
    GROUP BY g.doc_id
    """,
)
def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document gram novelty: over each document's DISTINCT
    SPAN_GRAM-token gram hashes, the count and fraction first
    introduced by this document (no smaller doc_id contains the gram).

    Shares q_dup_spans' front end -- positional grams reduced to the
    portable 60-bit hash before any exchange -- then DISTINCTs per
    document (repeated phrases inside one document are one gram,
    making the score a set measure): (1) the distinct is one mergeable
    exchange keyed on (doc, hash); (2) SINGLE-PASS first-introduction
    marking (round 10, the q_dup_spans rewrite's sibling):
    "this document introduced the gram" is exactly
    doc_id == min(doc_id) over the ghash window partition, so one
    exchange on the hash marks every row -- the r9 form aggregated a
    first_doc table and joined it back, paying the firsts exchange,
    BOTH join-side exchanges, and a checkpoint to stop the lineage
    re-running (1.45x at sf0.1: 1.78 -> 1.23 s, identical rows, and
    the checkpoint is gone because nothing consumes the frame twice
    anymore); (3) the per-doc rollup is an ordinary count/sum
    aggregation. Text never rides a shuffle.

    Scale: the same posture as q_dup_spans; a mega-hot gram makes one
    hot window partition processed by one linear min/max task -- the
    same exposure the join form had on the same key. The Bloom
    prefilter does NOT apply here (every gram has a first occurrence
    -- the marking is dense by construction).

    tests/test_dup_spans.py recomputes novelty in pure Python
    (third-engine check) and pins the identities n_novel <= n_grams
    and sum(n_novel) == count(distinct gram hashes corpus-wide).
    """
    from pyspark.sql.window import Window

    grams = (
        span_grams(load_table(spark, sf_dir, "documents", spread=True))
        .select("doc_id", "ghash")
        .distinct()
    )
    w = Window.partitionBy("ghash")
    novel = F.when(
        F.col("doc_id") == F.min("doc_id").over(w), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        grams.withColumn("nv", novel)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("nv").cast("long").alias("n_novel"),
            F.round(
                F.sum("nv").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# Source overlap matrix: how much SPAN_GRAM-token gram content every
# source pair shares -- the provenance diagnostic behind "is crawl B a
# re-scrape of crawl A" and the source-level roll-up of q_dup_spans'
# document-level evidence. Directional containments distinguish
# "B copies A" from "A and B overlap a little".
# --------------------------------------------------------------------------


@query(
    "q_source_overlap",
    oracle="""
    WITH toks AS (
      SELECT source,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT source,
             unnest(list_transform(
               range(0, len(t) - 4),
               i -> CAST('0x' || substring(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15) AS BIGINT)
             )) AS ghash
      FROM toks WHERE len(t) >= 5
    ),
    nt AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS g FROM grams
      GROUP BY 1
    ),
    inter AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM grams a JOIN grams b
        ON a.ghash = b.ghash AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           a.g AS grams_a, b.g AS grams_b,
           COALESCE(i.shared, 0) AS shared,
           ROUND(CAST(COALESCE(i.shared, 0) AS DOUBLE)
                 / CAST(a.g + b.g - COALESCE(i.shared, 0) AS DOUBLE),
                 6) AS jaccard,
           ROUND(CAST(COALESCE(i.shared, 0) AS DOUBLE)
                 / CAST(a.g AS DOUBLE), 6) AS containment_a,
           ROUND(CAST(COALESCE(i.shared, 0) AS DOUBLE)
                 / CAST(b.g AS DOUBLE), 6) AS containment_b
    FROM nt a JOIN nt b ON a.source < b.source
    LEFT JOIN inter i ON i.sa = a.source AND i.sb = b.source
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise gram-content overlap between sources: for every source
    pair, both distinct-gram set sizes, the shared-gram count, Jaccard
    similarity, and BOTH directional containments (shared / |a| and
    shared / |b| -- a high containment_a with low containment_b says
    "a is mostly inside b", the re-scrape signature).

    Shapes: (1) DISTINCT (source, gram-hash) presence -- the
    corpus-proportional exchange, text already reduced to the portable
    60-bit hash in the row (the span_grams discipline at source
    grain); (2) set sizes are one mergeable aggregation to |sources|
    rows; (3) the intersection self-join keys on the gram hash, and
    each gram contributes at most |sources|^2 pairs -- with S sources
    the candidate space is bounded by S(S-1)/2 per gram, collapsing
    map-side to the S^2-row pair domain; (4) the pair domain itself
    (cross of source totals, LEFT JOIN so zero-overlap pairs still
    report) is broadcast-sized. Every ratio is exact integers under
    one shared division text.

    Scale: the only corpus-proportional stages are the distinct and
    the hash-keyed self-join; both shuffle 8-byte hashes. At web scale
    the same plan bounds to (gram, source-set) rows; sources are
    typically O(100), keeping the pair fan-out trivial. Swap source
    for (source, month) to get drift-over-time overlap with the same
    plan.

    tests/test_dup_spans.py recomputes the matrix from Python gram
    sets (third-engine check) and pins containment/Jaccard identities.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    staged = docs.select("source", tokens_col().alias("t")).filter(
        F.size("t") >= SPAN_GRAM
    )
    gram_strs = F.expr(
        "transform(sequence(0, size(t) - 5),"
        " i -> concat_ws(' ', slice(t, i + 1, 5)))"
    )
    # lazy localCheckpoint: the distinct gram set feeds the totals
    # and BOTH self-join sides -- round-13 A/B: removing it re-ran the
    # gram explode (executed records doubled; 1.02 -> 1.30 s), so it
    # stays (cluster scale prefers reliable checkpoint())
    grams = (
        staged.select("source", F.explode(gram_strs).alias("gram"))
        .select("source", portable_hash64(F.col("gram")).alias("ghash"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nt = grams.groupBy("source").agg(F.count(F.lit(1)).alias("g"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.ghash") == F.col("b.ghash"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na, nb = nt.alias("na"), nt.alias("nb")
    dom = na.join(
        nb, F.col("na.source") < F.col("nb.source")
    ).select(
        F.col("na.source").alias("sa"),
        F.col("nb.source").alias("sb"),
        F.col("na.g").alias("grams_a"),
        F.col("nb.g").alias("grams_b"),
    )
    shared = F.coalesce("shared", F.lit(0).cast("long"))
    return (
        dom.join(F.broadcast(inter), ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "grams_a",
            "grams_b",
            shared.alias("shared"),
            F.round(
                shared.cast("double")
                / (F.col("grams_a") + F.col("grams_b") - shared).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
            F.round(
                shared.cast("double") / F.col("grams_a").cast("double"), 6
            ).alias("containment_a"),
            F.round(
                shared.cast("double") / F.col("grams_b").cast("double"), 6
            ).alias("containment_b"),
        )
    )


# --------------------------------------------------------------------------
# KMV-sketched source overlap: the sub-corpus-cost fork of
# q_source_overlap. The exact form distincts and self-joins the FULL
# gram set per source pair -- at 100 TB that hash-keyed self-join is
# the bill. The KMV fork answers the same questions (union, Jaccard,
# both containments) from K_KMV-long bottom-k sketches: per-source
# artifacts of 64 longs that merge by union+trim (associative,
# commutative, duplicate-insensitive), so any pair -- including pairs
# across corpora sketched at different times -- costs sketch-sized
# work, never a corpus rescan. Registered with the exact legs alongside
# as the certificate (the q_set_overlap_kmv discipline): at test SF the
# driver hash-compares exact AND estimated columns; at production the
# exact legs drop and only sketches ride.
# --------------------------------------------------------------------------

#: Sketch size for source-overlap sketches (shared with the KMV
#: audience-overlap family in pipeline_ops: rsd ~ 1/sqrt(K-2) ~ 13%).
SOV_K = 64

#: 2^60 as an exact double literal (the portable hash range).
_SOV_TWO60 = "1152921504606846976.0"

# Estimator arithmetic as SHARED TEXT (Spark F.expr == DuckDB SQL over
# identically-named columns) so the emitted doubles are bit-identical:
# distinct-count estimate is exact below K (the sketch holds the whole
# set), else the classic (K-1)/F(h_K); jaccard is the match fraction
# inside the trimmed union sketch; intersection is their product; the
# containments divide it by each side's own sketch estimate.
_SOV_UNION_EST = (
    f"CASE WHEN cnt_u < {SOV_K} THEN CAST(cnt_u AS DOUBLE)"
    f" ELSE ({SOV_K - 1}.0 * {_SOV_TWO60}) / CAST(h_k AS DOUBLE) END"
)
_SOV_EST_A = (
    f"CASE WHEN cnt_a < {SOV_K} THEN CAST(cnt_a AS DOUBLE)"
    f" ELSE ({SOV_K - 1}.0 * {_SOV_TWO60}) / CAST(h_ka AS DOUBLE) END"
)
_SOV_EST_B = (
    f"CASE WHEN cnt_b < {SOV_K} THEN CAST(cnt_b AS DOUBLE)"
    f" ELSE ({SOV_K - 1}.0 * {_SOV_TWO60}) / CAST(h_kb AS DOUBLE) END"
)
_SOV_JACC_EST = "CAST(c AS DOUBLE) / CAST(cnt_u AS DOUBLE)"
_SOV_INTER_EST = f"({_SOV_JACC_EST}) * ({_SOV_UNION_EST})"
_SOV_CONT_A_EST = f"({_SOV_INTER_EST}) / ({_SOV_EST_A})"
_SOV_CONT_B_EST = f"({_SOV_INTER_EST}) / ({_SOV_EST_B})"


@query(
    "q_source_overlap_kmv",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT source,
             unnest(list_transform(
               range(0, len(t) - 4),
               i -> CAST('0x' || substring(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15) AS BIGINT)
             )) AS ghash
      FROM toks WHERE len(t) >= 5
    ),
    nt AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS g FROM grams
      GROUP BY 1
    ),
    ks AS (
      SELECT source, ghash AS h FROM (
        SELECT source, ghash,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY ghash)
                 AS rn
        FROM grams) t
      WHERE rn <= {SOV_K}
    ),
    sk AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt_s, MAX(h) AS h_s
      FROM ks GROUP BY 1
    ),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb,
             a.g AS grams_a, b.g AS grams_b,
             x.cnt_s AS cnt_a, x.h_s AS h_ka,
             y.cnt_s AS cnt_b, y.h_s AS h_kb
      FROM nt a JOIN nt b ON a.source < b.source
      JOIN sk x ON x.source = a.source
      JOIN sk y ON y.source = b.source
    ),
    m AS (
      SELECT p.sa, p.sb, s.h, 1 AS ia, 0 AS ib
      FROM pairs p JOIN ks s ON s.source = p.sa
      UNION ALL
      SELECT p.sa, p.sb, s.h, 0 AS ia, 1 AS ib
      FROM pairs p JOIN ks s ON s.source = p.sb
    ),
    u AS (
      SELECT sa, sb, h, MAX(ia) AS ia, MAX(ib) AS ib
      FROM m GROUP BY 1, 2, 3
    ),
    uk AS (
      SELECT * FROM (
        SELECT u.*, ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h)
                 AS rn
        FROM u) t
      WHERE rn <= {SOV_K}
    ),
    st AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS cnt_u,
             CAST(SUM(ia * ib) AS BIGINT) AS c, MAX(h) AS h_k
      FROM uk GROUP BY 1, 2
    ),
    inter AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM grams a JOIN grams b
        ON a.ghash = b.ghash AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.sa AS source_a, p.sb AS source_b,
           p.grams_a, p.grams_b,
           COALESCE(i.shared, CAST(0 AS BIGINT)) AS shared,
           {_SOV_UNION_EST} AS union_est,
           {_SOV_JACC_EST} AS jaccard_est,
           {_SOV_INTER_EST} AS inter_est,
           {_SOV_CONT_A_EST} AS containment_a_est,
           {_SOV_CONT_B_EST} AS containment_b_est
    FROM pairs p
    JOIN st ON st.sa = p.sa AND st.sb = p.sb
    LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    """,
)
def q_source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source overlap from KMV bottom-k sketches, with the
    exact gram counts and exact shared-gram count alongside as the
    certificate (VERDICT r9 ask #6).

    Sketch construction: per source, the SOV_K smallest distinct
    portable 60-bit gram hashes -- a bottom-k uniform sample of the
    source's distinct-gram set, built through row_number + filter so
    WindowGroupLimit forwards at most SOV_K rows per source from each
    map partition BELOW the exchange. Pair estimation merges the two
    sketches (union, trim to SOV_K), counts keys present in both, and
    evaluates union / Jaccard / intersection / both-containment
    estimators as shared expression text the DuckDB oracle runs
    verbatim -- the ESTIMATES hash-compare cross-engine, not just the
    exact legs.

    Scale: the exact legs (full-gram DISTINCT + hash-keyed self-join,
    q_source_overlap's bill) exist here only as the test-SF
    certificate. Drop them and the plan reads the corpus ONCE to build
    S sketches of SOV_K longs, after which every pairwise question --
    S(S-1)/2 of them, or pairs against a corpus sketched last month --
    is sketch-sized: union+trim is associative and commutative, and
    re-observing a gram cannot change a min, so sketches also merge
    across shards/partitions/days for free. docs/SCALE.md's sovsweep
    table measures the crossover against the exact self-join.

    tests/test_dup_spans.py recomputes sketches and estimators from
    Python gram sets (third-engine check) and pins the estimates
    against the 1/sqrt(K-2) error envelope.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    staged = docs.select("source", tokens_col().alias("t")).filter(
        F.size("t") >= SPAN_GRAM
    )
    gram_strs = F.expr(
        "transform(sequence(0, size(t) - 5),"
        " i -> concat_ws(' ', slice(t, i + 1, 5)))"
    )
    # lazy localCheckpoint: the distinct gram set feeds the totals,
    # the sketch build, and both exact-self-join sides -- round-13
    # A/B: removal re-ran the gram explode (1.67 -> 2.12 s), so the
    # checkpoints stay.
    grams = (
        staged.select("source", F.explode(gram_strs).alias("gram"))
        .select("source", portable_hash64(F.col("gram")).alias("ghash"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    from pyspark.sql.window import Window

    nt = grams.groupBy("source").agg(F.count(F.lit(1)).alias("g"))
    w = Window.partitionBy("source").orderBy("ghash")
    ks = (
        grams.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOV_K)
        .select("source", F.col("ghash").alias("h"))
        .localCheckpoint(eager=False)
    )
    sk = ks.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt_s"), F.max("h").alias("h_s")
    )
    pairs = (
        nt.alias("a")
        .join(nt.alias("b"), F.col("a.source") < F.col("b.source"))
        .join(
            sk.alias("x"), F.col("x.source") == F.col("a.source")
        )
        .join(
            sk.alias("y"), F.col("y.source") == F.col("b.source")
        )
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            F.col("a.g").alias("grams_a"),
            F.col("b.g").alias("grams_b"),
            F.col("x.cnt_s").alias("cnt_a"),
            F.col("x.h_s").alias("h_ka"),
            F.col("y.cnt_s").alias("cnt_b"),
            F.col("y.h_s").alias("h_kb"),
        )
        .localCheckpoint(eager=False)
    )
    sides = pairs.select("sa", "sb")
    m = (
        sides.join(F.broadcast(ks), ks["source"] == sides["sa"])
        .select(
            "sa", "sb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib")
        )
        .unionAll(
            sides.join(F.broadcast(ks), ks["source"] == sides["sb"]).select(
                "sa", "sb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib")
            )
        )
    )
    u = m.groupBy("sa", "sb", "h").agg(
        F.max("ia").alias("ia"), F.max("ib").alias("ib")
    )
    wu = Window.partitionBy("sa", "sb").orderBy("h")
    st = (
        u.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= SOV_K)
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).alias("cnt_u"),
            F.sum(F.col("ia") * F.col("ib")).alias("c"),
            F.max("h").alias("h_k"),
        )
    )
    a, b = grams.alias("ga"), grams.alias("gb")
    inter = (
        a.join(
            b,
            (F.col("ga.ghash") == F.col("gb.ghash"))
            & (F.col("ga.source") < F.col("gb.source")),
        )
        .groupBy(
            F.col("ga.source").alias("sa"), F.col("gb.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(F.broadcast(st), ["sa", "sb"])
        .join(F.broadcast(inter), ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "grams_a",
            "grams_b",
            F.coalesce("shared", F.lit(0).cast("long")).alias("shared"),
            F.expr(_SOV_UNION_EST).alias("union_est"),
            F.expr(_SOV_JACC_EST).alias("jaccard_est"),
            F.expr(_SOV_INTER_EST).alias("inter_est"),
            F.expr(_SOV_CONT_A_EST).alias("containment_a_est"),
            F.expr(_SOV_CONT_B_EST).alias("containment_b_est"),
        )
    )
