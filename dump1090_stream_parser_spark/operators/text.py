"""Tier C: text analysis over the ``documents`` table (SURVEY.md §2.3 C4;
north-star training-data ops: language-ID, quality scoring, token
counting, fingerprinting).

All five queries are pure Catalyst expressions -- tokenization is
``split``/``explode``, hashing is the portable md5-based family, scoring
is exact integer counts with single final divisions -- so results are
bit-reproducible and every query has a full DuckDB oracle.

Scale posture: token/bigram explodes multiply rows 10-300x *before* a
shuffle; all aggregations are partial-agg friendly (sum/count by key).
At 100 TB the explode stays narrow (no shuffle until the groupBy), and
the groupBy keys (token, bigram, doc_id) are high-cardinality enough to
spread; the known skew risk is stop-words in q_token_tf, which partial
aggregation absorbs map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import keyed_spread, load_table, table_path
from .registry import query

#: Small fixed stopword list (engine-defined; mirrored in oracles).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "data")

#: Corpus language inventory (TESTDATA documents.lang domain),
#: documentation of the expected domain. q_lang_id no longer pivots on
#: it: profiles key on the langs the corpus actually contains, so a
#: drifted lang degrades gracefully instead of crashing the scorer.
LANG_VALUES = ("de", "en", "es", "fr", "zh")

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def tokens_col(text: str | F.Column = "text") -> F.Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda t: t != "")


# --------------------------------------------------------------------------


@query(
    "q_token_tf",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 100
    """,
)
def q_token_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top-100 (C4). explode -> hash-agg -> top-k;
    stop-word skew is absorbed by map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


@query(
    "q_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
      WHERE token <> '' GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN df USING (token), n
    ORDER BY tfidf DESC, doc_id, token
    LIMIT 200
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf via two aggregations + a broadcast-able df join (C4).

    The doc-frequency side is |vocabulary| rows -- tiny relative to the
    corpus -- so at scale it broadcasts and the tf side never reshuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # (Deriving df from tf for ReuseExchange was measured: the exchange
    # is not reusable across the broadcast-subtree boundary, and warm
    # times are identical -- keep the standard two-aggregation form.)
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; driver-side by design (one number)
    return (
        tf.join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("doc_id"), F.asc("token"))
        .limit(200)
    )


# --------------------------------------------------------------------------
# Language ID: character-bigram profile scorer (C4 "language-ID (n-gram
# heuristic)"). Two-pass: (1) aggregate per-language bigram profiles from
# the labeled corpus, (2) score every doc against every profile and take
# the argmax. Integer counts end-to-end => exact cross-engine parity.
# --------------------------------------------------------------------------


@query(
    "q_lang_id",
    oracle="""
    WITH bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               generate_series(1, length(lower(text)) - 1),
               i -> substr(lower(text), i, 2))) AS bigram
      FROM documents
    ),
    profile AS (
      SELECT lang AS plang, bigram, COUNT(*) AS cnt
      FROM bg GROUP BY plang, bigram
    ),
    scores AS (
      SELECT bg.doc_id, bg.lang, profile.plang,
             SUM(profile.cnt) AS score
      FROM bg JOIN profile USING (bigram)
      GROUP BY bg.doc_id, bg.lang, profile.plang
    ),
    best AS (
      SELECT doc_id, lang, plang AS guessed,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, plang) AS rn
      FROM scores
    )
    SELECT lang, guessed, COUNT(*) AS n_docs
    FROM best WHERE rn = 1
    GROUP BY lang, guessed
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix from a char-bigram profile scorer.

    Round-7 shape -- the engine's last corpus-sized explode is gone.
    One small exchange repartitions (doc_id, lang, text) (the
    q_containment rebalance: this corpus arrives as one row-group, and
    at production scale the source's own partitioning provides the
    spread), lazily checkpointed so BOTH passes read it once:

    1. PROFILE, an Arrow partial-aggregation pass: each partition
       bigram-codes its docs via the utf-32 view (np.frombuffer
       matches F.ascii/DuckDB ascii codepoints -- the
       rolling-fingerprint precedent), np.unique-counts occurrences
       per language, and emits ONE partial profile bounded by
       |alphabet|^2 x |langs| rows regardless of corpus size. The
       partials are merged DRIVER-side (the profile is a driver
       artifact exactly like the IVF centroids -- at 100 TB it comes
       from the catalog/config or a sampled training job).
    2. SCORING, a second Arrow pass: per doc, distinct-count bigram
       codes, searchsorted-lookup into the merged profile, fold
       int64 counts, argmax with ties toward the lowest language
       (the observed-lang list is sorted; np.argmax takes the first
       max -- the oracle's ORDER BY score DESC, plang). Profiles key
       on the langs the corpus actually contains, exactly like the
       oracle's GROUP BY lang -- an out-of-catalog lang grows its own
       profile instead of crashing the executor.

    All arithmetic is int64, so results are bit-equal to the previous
    all-JVM shape (split -> explode -> broadcast-join -> wide agg),
    which paid a serial 6M-row explode TWICE plus a hash-join probe
    per bigram occurrence; only the 25-cell confusion aggregation
    remains on the wire (measured 2.17 -> 1.0 s on the sf0.1 headline
    line). Like the containment filler, the Python/DuckDB lower()
    agreement leans on the corpus being verified ASCII-only.

    (Negative design notes retained from earlier rounds: building the
    profile from a pre-aggregated (doc, lang, bigram, n) subtree via
    ReuseExchange shuffled the corpus bigram stream -- alphabet-sized
    partial aggregation straight off occurrences was 25% faster; and
    substr-per-index bigramming inside a transform lambda re-evaluated
    lower(text) per element, O(len^2), 10x slower than split+slices.)
    """
    import numpy as np

    # NO scan_spread stacked here: the operator's own doc_id
    # repartition below IS the rebalance (the q_containment note).
    docs = load_table(spark, sf_dir, "documents")
    staged = (
        docs.select("doc_id", "lang", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .localCheckpoint(eager=False)
    )

    def _doc_codes(text: str):
        lt = str(text).lower()
        if len(lt) < 2:
            return None  # no bigrams: absent from profile AND matrix,
            # same as the explode/oracle semantics
        c = np.frombuffer(
            lt.encode("utf-32-le"), dtype="uint32"
        ).astype("int64")
        return c[:-1] * 0x110000 + c[1:]

    def _profile_batches(it):
        import pandas as pd

        # Partials are keyed by the OBSERVED lang value, not a
        # pre-baked index: the oracle's profile CTE groups whatever
        # langs exist in the corpus, so a drifted lang must grow a
        # profile rather than crash the executor (round-7 advisor
        # finding: lang_index[lang] raised KeyError on unknown langs).
        # Cost is a short string per alphabet-bounded partial row.
        per_lang: dict[str, list] = {}
        for pdf in it:
            by_lang: dict[str, list] = {}
            for lang, text in zip(pdf["lang"], pdf["text"]):
                codes = _doc_codes(text)
                if codes is None:
                    continue
                by_lang.setdefault(str(lang), []).append(codes)
            for lv, arrs in by_lang.items():
                u, n = np.unique(
                    np.concatenate(arrs), return_counts=True
                )
                per_lang.setdefault(lv, []).append((u, n))
        out_b, out_l, out_c = [], [], []
        for lv, parts in per_lang.items():
            cat = np.concatenate([u for u, _ in parts])
            wts = np.concatenate([n for _, n in parts])
            uu, inv = np.unique(cat, return_inverse=True)
            tot = np.zeros(len(uu), dtype="int64")
            np.add.at(tot, inv, wts)
            out_b.append(uu)
            out_l.extend([lv] * len(uu))
            out_c.append(tot)
        if out_b:
            yield pd.DataFrame(
                {
                    "bigram": np.concatenate(out_b),
                    "plang": out_l,
                    "cnt": np.concatenate(out_c),
                }
            )

    partials = staged.mapInPandas(
        _profile_batches, schema="bigram bigint, plang string, cnt bigint"
    ).collect()
    # Sorted observed langs: np.argmax's first-max then equals the
    # oracle's ORDER BY score DESC, plang ASC tie-break.
    langs = sorted({str(r["plang"]) for r in partials})
    lang_index = {lang: i for i, lang in enumerate(langs)}
    code_cnts: dict[int, list[int]] = {}
    for r in partials:
        code_cnts.setdefault(int(r["bigram"]), [0] * len(langs))[
            lang_index[str(r["plang"])]
        ] += int(r["cnt"])
    keys_sorted = sorted(code_cnts)
    cnt_rows = [code_cnts[k] for k in keys_sorted]

    def _score_batches(it):
        import pandas as pd

        k = np.asarray(keys_sorted, dtype="int64")
        cnts = np.asarray(cnt_rows, dtype="int64")
        if len(k) == 0:  # empty corpus: nothing can score
            return
        for pdf in it:
            out_lang, out_guess = [], []
            for lang, text in zip(pdf["lang"], pdf["text"]):
                u_codes = _doc_codes(text)
                if u_codes is None:
                    continue
                u, n = np.unique(u_codes, return_counts=True)
                pos = np.searchsorted(k, u)
                valid = (pos < len(k)) & (
                    k[pos.clip(max=len(k) - 1)] == u
                )
                if not valid.any():
                    continue  # no profile overlap: no scores row,
                    # matching the oracle inner join (unreachable when
                    # the profile comes from this same corpus)
                scores = (
                    n[valid][:, None] * cnts[pos[valid]]
                ).sum(axis=0)
                out_lang.append(lang)
                out_guess.append(langs[int(np.argmax(scores))])
            yield pd.DataFrame({"lang": out_lang, "guessed": out_guess})

    scored = staged.drop("doc_id").mapInPandas(
        _score_batches, schema="lang string, guessed string"
    )
    return scored.groupBy("lang", "guessed").agg(
        F.count("*").alias("n_docs")
    )


@query(
    "q_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_STOP_SQL}))) AS n_stopwords,
             length(replace(text, ' ', '')) AS n_letter_chars,
             length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
               AS n_punct,
             length(text) AS n_chars_full
      FROM documents
    )
    SELECT doc_id, lang, n_tokens, n_stopwords,
           CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_letter_chars AS DOUBLE) / n_tokens AS avg_token_len,
           CAST(n_punct AS DOUBLE) / n_chars_full AS punct_ratio,
           0.5 * (CAST(n_stopwords AS DOUBLE) / n_tokens)
             + 0.3 * (CASE WHEN n_tokens > 100 THEN 100 ELSE n_tokens END
                      / 100.0)
             + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars_full)
             AS quality
    FROM m
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality (C4): stopword ratio + length prior +
    punctuation penalty. Integer counts, single divisions -> exact."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_letters = F.length(F.regexp_replace("text", " ", ""))
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", "[^a-z0-9 ]", "")
    )
    m = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_letters.alias("n_letter_chars"),
        n_punct.alias("n_punct"),
        F.length("text").alias("n_chars"),
    )
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens")
    avg_tok = F.col("n_letter_chars").cast("double") / F.col("n_tokens")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    return m.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stopwords",
        stop_ratio.alias("stopword_ratio"),
        avg_tok.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        (
            0.5 * stop_ratio
            + 0.3 * (F.least(F.col("n_tokens"), F.lit(100)) / 100.0)
            + 0.2 * (1.0 - punct_ratio)
        ).alias("quality"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> '')))
                AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+')))
                AS BIGINT) AS re_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY source
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (C4): whitespace split and a BPE-ish
    regex ([a-z]+|[0-9]+ runs), aggregated per source."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col())).alias("ws_tokens"),
        F.sum(F.regexp_count("text", F.lit("[a-z]+|[0-9]+"))).alias(
            "re_tokens"
        ),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "q_doc_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             {portable_hash64_sql("lower(trim(text))")} AS fingerprint
      FROM documents
    )
    SELECT doc_id, source, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_same,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_doc_id
    FROM fp
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (C4): portable 60-bit hash of normalized text,
    with duplicate-group size and canonical (min) doc id -- the primitive
    under exact dedup at any scale (hash is shuffle key, not raw text)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    w = Window.partitionBy("fingerprint")
    return docs.select(
        "doc_id",
        "source",
        portable_hash64(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    ).select(
        "doc_id",
        "source",
        "fingerprint",
        F.count("*").over(w).alias("n_same"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    )


# --------------------------------------------------------------------------
# Rolling-hash fingerprint (C4 "document fingerprinting (rolling hash)"):
# polynomial hash of every WINDOW_CHARS-char window, winnowed to the 4
# smallest distinct hashes per doc. Shared sketch hashes indicate shared
# substrings -- the plagiarism/near-dup primitive. Integer arithmetic
# mod 2^31-1 on unicode codepoints, identical in both engines (Spark
# aggregate seeds with 0, DuckDB list_reduce seeds with the first
# element: ((0*B + c1)*B + c2) == ((c1)*B + c2), same polynomial).
# --------------------------------------------------------------------------

WINDOW_CHARS = 8
_ROLL_B = 31
_ROLL_P = 2147483647  # MERSENNE31
SKETCH_K = 4


@query(
    "q_rolling_fingerprint",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lower(text) AS lt FROM documents
    ),
    codes AS (
      SELECT doc_id,
             list_transform(generate_series(1, length(lt)),
                            i -> CAST(ascii(substr(lt, i, 1)) AS BIGINT))
               AS cs
      FROM c
    ),
    hashes AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(cs) - {WINDOW_CHARS} + 1),
               i -> list_reduce(cs[i:i+{WINDOW_CHARS}-1],
                                (acc, x) -> (acc * {_ROLL_B} + x)
                                            % {_ROLL_P})) AS hs
      FROM codes
    )
    SELECT doc_id,
           {", ".join(
               f"list_sort(list_distinct(hs))[{i}] AS fp{i}"
               for i in range(1, SKETCH_K + 1)
           )}
    FROM hashes
    """,
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash sketch per document (C4). The codepoint
    array is staged once; each window hash folds {WINDOW_CHARS} codes --
    a narrow map, no shuffle, O(len * window) per doc.

    The K sketch hashes come back as scalar columns fp1..fpK (NULL when
    the doc has fewer distinct windows): the driver canonicalizer can't
    sort array cells, and scalars keep the value-hash check exact."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    staged = docs.select(
        "doc_id",
        F.transform(
            F.split(F.lower(F.col("text")), ""), lambda ch: F.ascii(ch)
        ).alias("_codes"),
    )
    cs = F.col("_codes")
    n = F.size(cs)
    window_hash = lambda i: F.aggregate(  # noqa: E731
        F.slice(cs, i, WINDOW_CHARS),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _ROLL_B + x) % _ROLL_P,
    )
    hashes = F.when(
        n >= WINDOW_CHARS,
        F.transform(
            F.sequence(F.lit(1), n - WINDOW_CHARS + 1), window_hash
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sketch = F.array_sort(F.array_distinct(hashes))
    # F.get is 0-based and NULL-safe past the end (element_at raises
    # under ANSI mode when a doc has < SKETCH_K distinct windows).
    return staged.select(
        "doc_id",
        *[
            F.get(sketch, i).alias(f"fp{i + 1}")
            for i in range(SKETCH_K)
        ],
    )


# --------------------------------------------------------------------------
# Containment detection (C4, the MOSS/winnowing architecture): find
# documents CONTAINED in other documents -- the asymmetric relation
# (quotes, aggregation pages, boilerplate-wrapped copies) that
# symmetric near-dup similarity misses. TRUE winnowing selection
# (min hash per sliding window of window-hashes) guarantees any shared
# substring of >= CONTAIN_K_CHARS + WINNOW_W - 1 = 23 chars shares a
# selected fingerprint, at ~2/(WINNOW_W+1) storage density -- the
# inverted-index fingerprint scheme plagiarism detectors run at
# corpus scale.
# --------------------------------------------------------------------------

#: Containment fingerprint geometry: LONGER than the
#: q_rolling_fingerprint sketch (16-char windows, winnow over 8) so a
#: fingerprint certifies a >= 23-char (~4-word) shared substring.
#: Geometry is the load-bearing scale decision here: with 8-char
#: windows on this small-vocabulary corpus, common word pairs collide
#: across unrelated docs, natural df explodes, and the stop-print cut
#: must either track corpus size (making the candidate space
#: Sum_h df_h^2 <= df_max * |prints| QUADRATIC in corpus -- measured
#: 55 s at 10x docs) or starve small docs of prints (measured recall
#: collapse). 23-char shingles are rare across unrelated docs, so an
#: ABSOLUTE df cut keeps recall AND keeps the candidate space linear.
CONTAIN_K_CHARS = 16
WINNOW_W = 8  # winnowing window (over the rolling window-hash stream)
#: Absolute stop-print cut: fingerprints in more docs than this are
#: boilerplate and are dropped before pairing.
CONTAIN_DF_MAX = 10
#: Minimum retained fingerprints for a doc to be judged (tiny docs
#: cannot be meaningfully contained).
CONTAIN_MIN_PRINTS = 5
#: Containment verdict: shared/|prints(A)| >= 0.7, compared in exact
#: integer arithmetic (10*shared >= 7*n) so no division crosses engines.
_CONTAIN_NUM, _CONTAIN_DEN = 7, 10
#: Synthesized container id for base doc d: -(d) - 1. Negative ids
#: cannot collide with any real (non-negative) doc_id at ANY corpus
#: size -- a fixed additive offset would silently alias real ids once
#: the corpus outgrew it, and both engines would alias identically, so
#: the parity gate could never catch it.
def contain_container_id(doc_id: int) -> int:
    return -doc_id - 1


#: Which docs get a synthesized containing "aggregation page".
_CONTAIN_SRC_SQL = "doc_id % 9 = 2"


def _winnowed_prints_batches(K: int, W: int):
    """mapInPandas body: (doc_id, lt) -> (doc_id, h) winnowed
    fingerprints, vectorized in numpy. Bit-identical to the
    declarative fold (same (acc*B + code) % P recurrence over utf-32
    CODEPOINTS -- matching F.ascii / DuckDB ascii semantics, not
    bytes), but O(K) vectorized passes instead of an interpreted
    O(len*K) HOF refold per row -- measured 52 s -> ~2 s for the
    fingerprint stage at sf0.1. int64 is safe: acc < P = 2^31, so
    acc*31 + code < 2^36."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    def gen(batches):
        for pdf in batches:
            ids: list = []
            hs: list = []
            for doc_id, lt in zip(pdf["doc_id"], pdf["lt"]):
                if lt is None:
                    continue  # NULL text: match the oracle's drop
                c = np.frombuffer(
                    lt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = len(c)
                if n < K:
                    continue
                h = np.zeros(n - K + 1, dtype=np.int64)
                for j in range(K):
                    h = (h * _ROLL_B + c[j : j + n - K + 1]) % _ROLL_P
                if len(h) < W:
                    continue
                sel = np.unique(sliding_window_view(h, W).min(axis=1))
                ids.append(np.full(len(sel), doc_id, dtype=np.int64))
                hs.append(sel)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "h": np.concatenate(hs),
                    }
                )

    return gen


@query(
    "q_containment",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, lower(text) AS lt FROM documents
      UNION ALL
      SELECT -doc_id - 1,
             lower(text) || ' ' || reverse(lower(text))
      FROM documents WHERE {_CONTAIN_SRC_SQL}
    ),
    codes AS (
      SELECT doc_id,
             list_transform(generate_series(1, length(lt)),
                            i -> CAST(ascii(substr(lt, i, 1)) AS BIGINT))
               AS cs
      FROM corpus
    ),
    hashes AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, len(cs) - {CONTAIN_K_CHARS} + 1),
               i -> list_reduce(cs[i:i+{CONTAIN_K_CHARS}-1],
                                (acc, x) -> (acc * {_ROLL_B} + x)
                                            % {_ROLL_P})) AS hs
      FROM codes
      WHERE len(cs) >= {CONTAIN_K_CHARS}
    ),
    winnowed AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(hs) - {WINNOW_W} + 1),
               j -> list_min(hs[j:j+{WINNOW_W}-1]))) AS sel
      FROM hashes
      WHERE len(hs) >= {WINNOW_W}
    ),
    prints AS (
      SELECT doc_id, unnest(sel) AS h FROM winnowed
    ),
    kept AS (
      SELECT doc_id, h FROM prints
      WHERE h IN (SELECT h FROM prints GROUP BY h
                  HAVING COUNT(*) <= {CONTAIN_DF_MAX})
    ),
    doc_n AS (
      SELECT doc_id, COUNT(*) AS n_prints FROM kept GROUP BY doc_id
    ),
    shared AS (
      SELECT a.doc_id AS contained_doc_id, b.doc_id AS container_doc_id,
             COUNT(*) AS n_shared
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT contained_doc_id, container_doc_id,
           n_shared, n_prints
    FROM shared JOIN doc_n ON doc_n.doc_id = contained_doc_id
    WHERE n_prints >= {CONTAIN_MIN_PRINTS}
      AND {_CONTAIN_DEN} * n_shared >= {_CONTAIN_NUM} * n_prints
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection over winnowed fingerprints:
    emit (contained, container) pairs where >= 70% of the contained
    doc's retained fingerprints appear in the container. The corpus is
    documents plus deterministically synthesized "aggregation pages"
    (base text + reversed-text filler, container id = -(base id) - 1,
    collision-free against real non-negative ids at any size) so true
    containments exist with known ground truth: base -> container
    scores ~1.0 and is emitted; container -> base scores ~0.5 (the
    filler halves it) and is NOT -- the asymmetry that distinguishes
    this from every symmetric near-dup operator in the registry.

    NO scan_spread here (round 13): the operator already rebalances
    the corpus with its own doc_id repartition below, and stacking the
    round-robin spread under it measured 1.9 -> 6.2 s (two exchanges
    plus a localCheckpoint over the longer lineage).

    Scale shape (the MOSS architecture): winnowing keeps
    ~2/(WINNOW_W+1) of window hashes per doc (narrow in-row selection);
    the stop-print df cut removes boilerplate fingerprints BEFORE the
    inverted-index self-join, bounding bucket fan-out; the pair space
    is grouped on (docA, docB) ids only -- text never rides an
    exchange. Verdicts are exact integer arithmetic (10*shared >=
    7*n_prints), so no division or float crosses engines; the planted
    recall floor is pinned in tests/test_approx.py."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.lower(F.col("text")).alias("lt"))
    # Filler = the reversed text. CROSS-ENGINE CAVEAT: Spark's
    # reverse() flips code points while DuckDB's flips grapheme
    # clusters, so this construction is only engine-identical because
    # the corpus is verified ASCII-only (every doc is generated from
    # the ASCII vocabulary; tests/test_parity.py would catch a drift).
    # A multilingual corpus would need a grapheme-neutral filler
    # (e.g. reverse the token ARRAY, not the string).
    containers = docs.filter(_CONTAIN_SRC_SQL).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(
            F.lower(F.col("text")),
            F.lit(" "),
            F.reverse(F.lower(F.col("text"))),
        ).alias("lt"),
    )
    corpus = base.unionByName(containers)
    # The winnowing stage is CPU-DENSE per row (per-char hash folds),
    # and this corpus arrives as 2 single-row-group parquet branches --
    # a serial scan would bottleneck the whole query (measured 14 s ->
    # ~2 s at sf0.01). One small exchange of (doc_id, text) rebalances
    # it across the cluster. Round 14 (VERDICT r13 #5): the exchange is
    # now CONDITIONAL via keyed_spread -- an unconditional
    # repartition(n, key) is NOT removed by AQE at production split
    # counts (explicit numPartitions pins it), so the old form would
    # have re-shuffled full document text on a well-partitioned source
    # for nothing. Locally the undershoot condition fires and the plan
    # is byte-identical to the old one (measured flat, 2.1-2.3 s).
    corpus = keyed_spread(
        spark, corpus, table_path(sf_dir, "documents"), ["doc_id"]
    )
    prints = corpus.mapInPandas(
        _winnowed_prints_batches(CONTAIN_K_CHARS, WINNOW_W),
        schema="doc_id bigint, h bigint",
    )
    # Lazy localCheckpoint: prints feeds FOUR consumers (the df table,
    # both pair-join sides, per-doc counts); without the cut each
    # re-runs the fingerprint pipeline. Same pattern/rationale as the
    # LSH signature table; at cluster scale persist the fingerprint
    # index (it IS the artifact a production system stores).
    prints = prints.localCheckpoint(eager=False)
    freq = prints.groupBy("h").agg(F.count("*").alias("df"))
    kept = (
        prints.join(freq, "h")
        .filter(F.col("df") <= CONTAIN_DF_MAX)
        .select("doc_id", "h")
    )
    doc_n = kept.groupBy("doc_id").agg(F.count("*").alias("n_prints"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained_doc_id"),
            F.col("b.doc_id").alias("container_doc_id"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(
            doc_n,
            shared.contained_doc_id == doc_n.doc_id,
        )
        .filter(
            (F.col("n_prints") >= CONTAIN_MIN_PRINTS)
            & (
                _CONTAIN_DEN * F.col("n_shared")
                >= _CONTAIN_NUM * F.col("n_prints")
            )
        )
        .select(
            "contained_doc_id", "container_doc_id", "n_shared", "n_prints"
        )
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split (training-pipeline primitive): a
# content-independent hash of the stable key assigns every row to a
# split -- reproducible across engines, runs, partitionings, and cluster
# sizes, which sample()/TABLESAMPLE are not. The assignment is a narrow
# map; downstream writers partition by `split`.
# --------------------------------------------------------------------------

SPLIT_PCT = (80, 10)  # train, val; remainder = test


@query(
    "q_train_split",
    oracle=f"""
    WITH assign AS (
      SELECT doc_id, lang, n_chars,
             CASE
               WHEN ({portable_hash64_sql("doc_id")}) % 100
                    < {SPLIT_PCT[0]} THEN 'train'
               WHEN ({portable_hash64_sql("doc_id")}) % 100
                    < {SPLIT_PCT[0] + SPLIT_PCT[1]} THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM assign
    GROUP BY split
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split assignment + per-split stats (C4
    training-pipeline op). The split of a given doc_id never changes
    when the corpus grows -- the property that keeps eval sets stable
    across dataset versions."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    bucket = portable_hash64(F.col("doc_id")) % 100
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[0] + SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --------------------------------------------------------------------------
# BM25 relevance scoring (training-pipeline / retrieval primitive).
# Conditional-aggregation shape: per-document term frequencies come from
# array ops (size(filter(...))) -- a narrow, explode-free, shuffle-free
# map -- and the three per-term partial scores are combined in a FIXED
# textual order, so the double arithmetic is bit-reproducible across
# engines (no order-dependent SUM over floats). Corpus stats (N, avgdl,
# per-term df) are one 1-row aggregate broadcast back onto the scan.
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "hash", "table")
BM25_K1 = 1.2
BM25_B = 0.75


def _eq_term(term: str):
    return lambda x: x == term


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, tf_<term>..., bm25) for the fixed BM25_TERMS query --
    the scoring core shared by q_bm25 and the hybrid-retrieval fusion
    (operators/inference.py). Narrow tf map + 1-row stats broadcast;
    bm25 is rounded to 6 decimals, which is what makes downstream
    ORDERING on it engine-portable despite ln()."""
    staged = docs.select("doc_id", tokens_col().alias("_t"))
    t = F.col("_t")
    per_doc = staged.select(
        "doc_id",
        F.size(t).alias("dl"),
        # NB: F.filter gives a 2-arg lambda the element index as the
        # second argument, so the term must be bound via a factory.
        *[
            F.size(F.filter(t, _eq_term(term))).alias(f"tf_{term}")
            for term in BM25_TERMS
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.col(f"tf_{term}") > 0, 1).otherwise(0)
            ).alias(f"df_{term}")
            for term in BM25_TERMS
        ],
    )

    def term_score(term: str) -> F.Column:
        tf = F.col(f"tf_{term}").cast("double")
        df = F.col(f"df_{term}").cast("double")
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        norm = tf + BM25_K1 * (
            1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
        )
        return idf * (tf * (BM25_K1 + 1)) / norm

    score = term_score("spark") + term_score("hash") + term_score("table")
    return per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        *[f"tf_{term}" for term in BM25_TERMS],
        F.round(score, 6).alias("bm25"),
    )


@query(
    "q_bm25",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl,
             len(list_filter(string_split(text, ' '), t -> t = 'spark'))
               AS tf_spark,
             len(list_filter(string_split(text, ' '), t -> t = 'hash'))
               AS tf_hash,
             len(list_filter(string_split(text, ' '), t -> t = 'table'))
               AS tf_table
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
             SUM(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS df_hash,
             SUM(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END) AS df_table
      FROM per_doc
    )
    SELECT doc_id, tf_spark, tf_hash, tf_table,
           ROUND(
             ln(1 + (n_docs - df_spark + 0.5) / (df_spark + 0.5))
               * (tf_spark * ({BM25_K1} + 1))
               / (tf_spark + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
             + ln(1 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
               * (tf_hash * ({BM25_K1} + 1))
               / (tf_hash + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
             + ln(1 + (n_docs - df_table + 0.5) / (df_table + 0.5))
               * (tf_table * ({BM25_K1} + 1))
               / (tf_table + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
             6) AS bm25
    FROM per_doc, stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed query (C4 retrieval/training-pipeline op).

    Per-doc tf comes from array ops on the token array -- no explode, no
    shuffle; the only exchange is the 1-row corpus-stats aggregate that
    broadcasts back onto the scan. At 100 TB the scoring pass stays a
    narrow map over the corpus + a TakeOrderedAndProject top-k.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Corpus-LM likelihood scoring (C4): rank documents by how probable
# their word sequences are under the corpus's own bigram model -- the
# KenLM-style quality signal training pipelines use to flag gibberish /
# boilerplate, self-contained (the corpus is its own LM). All
# arithmetic is INTEGER (scaled conditional probabilities with integer
# division), so the score is engine-exact with no log()/libm drift.
# --------------------------------------------------------------------------

#: Fixed-point scale for conditional probabilities (parts-per-billion),
#: applied as two factors (1e5 then 1e4) so the exact integer
#: (c12 * 1e9) DIV c1 is computed WITHOUT forming the 1e9-scaled
#: product: c12*1e9 would wrap a 64-bit long once a bigram count
#: passes ~9.2e9 occurrences -- real at web scale -- while the split
#: form is exact (and 64-bit safe in both factors, since c12 <= c1)
#: for first-word counts up to ~9.2e13 occurrences. Identity:
#: c12*1e9 DIV c1 == (c12*1e5 DIV c1)*1e4 + ((c12*1e5 % c1)*1e4) DIV c1.
LM_PROB_SCALE = 1_000_000_000
_LM_SCALE_HI = 100_000
_LM_SCALE_LO = 10_000


def _lm_prob_sql(c12: str, c1: str, div: str) -> str:
    """The overflow-safe exact fixed-point conditional probability,
    rendered for either engine (``div`` is ``DIV`` in Spark SQL,
    ``//`` in DuckDB). One shared builder so the two sides cannot
    drift."""
    hi = f"({c12} * {_LM_SCALE_HI})"
    return (
        f"(({hi} {div} {c1}) * {_LM_SCALE_LO}"
        f" + (({hi} % {c1}) * {_LM_SCALE_LO}) {div} {c1})"
    )


#: Bottom-k "least corpus-like" documents exported.
LM_BOTTOM_K = 20

_LM_BIGRAM_CTE = """
    toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
      FROM toks
    )
"""


@query(
    "q_lm_score",
    oracle=f"""
    WITH {_LM_BIGRAM_CTE},
    pair_counts AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
    ),
    first_counts AS (
      SELECT w1, SUM(c12) AS c1 FROM pair_counts GROUP BY w1
    ),
    prob AS (
      SELECT p.w1, p.w2,
             {_lm_prob_sql("p.c12", "f.c1", "//")} AS prob_nano
      FROM pair_counts p JOIN first_counts f ON f.w1 = p.w1
    ),
    doc_bg AS (
      SELECT doc_id, lang, w1, w2, COUNT(*) AS n
      FROM bg GROUP BY doc_id, lang, w1, w2
    ),
    scored AS (
      SELECT d.doc_id, d.lang,
             CAST(SUM(d.n) AS BIGINT) AS n_bigrams,
             CAST(SUM(d.n * prob_nano) AS BIGINT) AS total_prob_nano
      FROM doc_bg d JOIN prob USING (w1, w2)
      GROUP BY d.doc_id, d.lang
    )
    SELECT doc_id, lang, n_bigrams,
           total_prob_nano // n_bigrams AS avg_prob_nano
    FROM scored
    ORDER BY avg_prob_nano ASC, doc_id
    LIMIT {LM_BOTTOM_K}
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-20 least-corpus-like documents under the corpus's own
    word-bigram LM: per-doc mean of the scaled conditional probability
    P(w2|w1) = c(w1,w2)/c(w1,*) over the doc's bigram occurrences. Low
    scores flag gibberish, boilerplate-with-rare-transitions, and
    wrong-corpus contamination -- the filtering signal a KenLM pass
    provides, without an external model.

    Scale shape: bigrams are built inside the row (transform over an
    index sequence, the q_ngram_top pattern -- no positional
    self-join); the model tables are (bigram, count) aggregations with
    map-side partials; scoring joins the DISTINCT (doc, bigram) counts
    against the probability table -- the tf-idf/BM25 scoring-join class
    q_tfidf already pins at this corpus-proportional tier -- and ends
    in TakeOrderedAndProject. Engine-exactness: conditional
    probabilities are parts-per-billion fixed-point integers summed as
    BIGINTs, so no log()/libm or float-association drift exists by
    construction -- and the scaling is applied in two factors (see
    _lm_prob_sql) so the product never wraps 64 bits even at
    web-scale bigram counts; ORDER BY carries the doc_id tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", "lang", tokens_col().alias("t"))
    pairs = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> struct(get(t, i - 1) AS w1, get(t, i) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    bg = staged.select(
        "doc_id", "lang", F.explode(pairs).alias("p")
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pair_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    first_counts = pair_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    prob = pair_counts.join(first_counts, "w1").select(
        "w1",
        "w2",
        F.expr(_lm_prob_sql("c12", "c1", "DIV")).alias("prob_nano"),
    )
    doc_bg = bg.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count("*").alias("n")
    )
    scored = (
        doc_bg.join(prob, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("prob_nano")).alias("total_prob_nano"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_bigrams",
            F.expr("total_prob_nano DIV n_bigrams").alias("avg_prob_nano"),
        )
        .orderBy(F.asc("avg_prob_nano"), F.asc("doc_id"))
        .limit(LM_BOTTOM_K)
    )


# --------------------------------------------------------------------------
# Corpus bigram frequency (n-gram analysis primitive). Bigrams are built
# per-row from the token array (transform over an index sequence) -- a
# narrow map with no positional self-join -- then one hash-agg + top-k.
# --------------------------------------------------------------------------


@query(
    "q_ngram_top",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM big
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 100
    """,
)
def q_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus bigrams (C4). Adjacent-pair construction happens
    inside the row via transform(sequence(...)) -- the classic
    positional self-join (tok a JOIN tok b ON ord+1) would shuffle the
    exploded corpus twice; this shape shuffles only (bigram, partial
    count) pairs and finishes with TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    staged = docs.select(tokens_col().alias("t"))
    # get() is 0-based; sequence(1, n-1) covers pairs (0,1)..(n-2,n-1).
    # sequence() is descending when start > stop, so guard size < 2.
    bigrams = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(get(t, i - 1), ' ', get(t, i)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Quality-filter cascade (training-pipeline gate): every doc gets a
# keep/drop decision plus the FIRST failing rule, evaluated in a fixed
# priority order. All per-doc features come from array ops -- the whole
# cascade is a narrow map; the only shuffle is the tiny final
# (lang, reason) rollup.
# --------------------------------------------------------------------------

QF_MIN_TOKENS = 20
QF_MAX_TOKENS = 400
QF_MIN_STOPWORD_RATIO = 0.05
QF_MAX_TOP_TOKEN_SHARE = 0.20


@query(
    "q_quality_filter",
    oracle=f"""
    WITH feat AS (
      SELECT lang, n_chars,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_STOP_SQL}))) AS n_stop,
             list_max(list_transform(
               list_distinct(list_filter(string_split(text, ' '),
                                         t -> t <> '')),
               x -> len(list_filter(string_split(text, ' '),
                                    y -> y = x)))) AS top_tok
      FROM documents
    ),
    decided AS (
      SELECT lang, n_chars,
             CASE
               WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short'
               WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long'
               WHEN CAST(n_stop AS DOUBLE) / n_tokens
                    < {QF_MIN_STOPWORD_RATIO} THEN 'low_stopword'
               WHEN CAST(top_tok AS DOUBLE) / n_tokens
                    > {QF_MAX_TOP_TOKEN_SHARE} THEN 'repetitive'
               ELSE 'keep'
             END AS reason
      FROM feat
    )
    SELECT lang, reason, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM decided
    GROUP BY lang, reason
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter cascade with per-(lang, reason) counts (C4
    training-pipeline gate). The max-token-share feature is computed
    inside the row (transform over distinct tokens), trading O(u*n)
    per-row work for zero shuffles -- at 100 TB that beats the
    two-level groupBy(doc_id, token) alternative, which would shuffle
    the exploded corpus."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Stage the token array in its own projection: the three features
    # (and the per-distinct-token inner filter) then reference the
    # already-split array instead of re-splitting text per reference
    # (CollapseProject keeps a multiply-referenced non-cheap alias in
    # its own project -- same trick as q_lang_id's char staging).
    staged = docs.select("lang", "n_chars", tokens_col().alias("_t"))
    t = F.col("_t")
    feat = staged.select(
        "lang",
        "n_chars",
        F.size(t).alias("n_tokens"),
        F.size(
            F.filter(t, lambda x: x.isin(*STOPWORDS))
        ).alias("n_stop"),
        F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda x: F.size(F.filter(t, _eq_col(x))),
            )
        ).alias("top_tok"),
    )
    reason = (
        F.when(F.col("n_tokens") < QF_MIN_TOKENS, "too_short")
        .when(F.col("n_tokens") > QF_MAX_TOKENS, "too_long")
        .when(
            F.col("n_stop").cast("double") / F.col("n_tokens")
            < QF_MIN_STOPWORD_RATIO,
            "low_stopword",
        )
        .when(
            F.col("top_tok").cast("double") / F.col("n_tokens")
            > QF_MAX_TOP_TOKEN_SHARE,
            "repetitive",
        )
        .otherwise("keep")
    )
    return (
        feat.select("lang", "n_chars", reason.alias("reason"))
        .groupBy("lang", "reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def _eq_col(target: F.Column):
    return lambda y: y == target


# --------------------------------------------------------------------------
# Corpus length histogram (fixed-width integer bins -- no float binning,
# so bin assignment is exact and engine-independent).
# --------------------------------------------------------------------------

HIST_BIN_CHARS = 50


@query(
    "q_length_hist",
    oracle=f"""
    SELECT lang,
           (n_chars // {HIST_BIN_CHARS}) * {HIST_BIN_CHARS} AS bin_lo,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang, bin_lo
    """,
)
def q_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length histogram (C4 corpus-analysis op).
    Integer-division binning is a narrow map; the aggregation is
    partial-agg friendly on a bounded (lang, bin) key space, so at
    100 TB the shuffle moves only |langs|*|bins| partial rows."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    bin_lo = (
        (F.col("n_chars") / HIST_BIN_CHARS).cast("bigint") * HIST_BIN_CHARS
    )
    return (
        docs.select("lang", "n_chars", bin_lo.alias("bin_lo"))
        .groupBy("lang", "bin_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# PII scrubbing: regex redaction with audit counts. The corpus itself is
# synthetic word salad with no PII, so the query plants one
# deterministic email + phone per row (derived from doc_id) and then
# scrubs them -- proving the redaction plumbing end-to-end with exact
# per-row counts and a fingerprint of the scrubbed output. Patterns
# stick to character classes + bounded repetition, the regex subset
# where Java regex (Spark) and RE2 (DuckDB) agree.
# --------------------------------------------------------------------------

PII_EMAIL_RE = "[A-Za-z0-9_.]+@[A-Za-z0-9.]+"
PII_PHONE_RE = "555-[0-9]{4}"


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>',
                                           'g'),
                            '{PII_PHONE_RE}', '<PHONE>', 'g') AS s
      FROM planted
    )
    SELECT doc_id, n_emails, n_phones,
           len(s) AS n_chars_scrubbed,
           {portable_hash64_sql("s")} AS scrub_fp
    FROM scrubbed
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (C4): plant a deterministic synthetic email +
    phone per document, scrub both with regexp_replace, and report
    per-row redaction counts plus the 60-bit fingerprint of the
    scrubbed text (the fingerprint makes the oracle comparison prove
    byte-exact replacement without hauling full texts through the
    harness).

    Entirely a narrow map -- regex extraction, replacement, hashing are
    all per-row JVM expressions; nothing shuffles. At 100 TB this is
    the cheapest kind of operator: linear scan, perfectly parallel,
    with the scrubbed column written straight back to parquet."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    scrubbed = planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("t", F.lit(PII_PHONE_RE), 0)).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace("t", PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("s"),
    )
    return scrubbed.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.length("s").alias("n_chars_scrubbed"),
        portable_hash64(F.col("s")).alias("scrub_fp"),
    )


# --------------------------------------------------------------------------
# Context-window chunking: split documents into fixed token windows with
# overlap -- the packing step before embedding / tokenization in an LLM
# pipeline. Pure narrow map: chunk boundaries come from an index
# sequence inside the row; no explode until the (small) chunk structs
# are built, and what shuffles downstream is fingerprints, never text.
# --------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


@query(
    "q_chunk_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(1, CAST(ceil(CAST(len(toks) - {CHUNK_OVERLAP} AS DOUBLE)
                                   / {_CHUNK_STRIDE}) AS BIGINT)) AS n_chunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM n
    )
    SELECT doc_id, chunk_idx,
           CAST(least({CHUNK_TOKENS}, n - chunk_idx * {_CHUNK_STRIDE})
                AS BIGINT) AS n_tokens,
           {portable_hash64_sql(
               "array_to_string(list_slice(toks,"
               f" chunk_idx * {_CHUNK_STRIDE} + 1,"
               f" least(chunk_idx * {_CHUNK_STRIDE} + {CHUNK_TOKENS}, n)), ' ')"
           )} AS chunk_fp
    FROM e
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap (C4 / training
    pipeline): 64-token (CHUNK_TOKENS) windows, 16-token (CHUNK_OVERLAP)
    overlap, last window short. Emits one row per chunk with its token
    count and 60-bit content fingerprint -- the downstream embed/pack
    stages key on the fingerprint, so raw chunk text never shuffles.

    Shape: everything up to the chunk explode is per-row array ops
    (token array staged once; chunk index sequence built in-row); the
    explode multiplies rows by ~n/48 (the chunk stride) but stays narrow --
    at 100 TB the chunker is a linear scan whose output is (id, idx,
    count, fingerprint) tuples, 32 bytes per chunk."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    staged = docs.select("doc_id", tokens_col().alias("toks"))
    n = F.size("toks").cast("long")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((n - F.lit(CHUNK_OVERLAP)) / F.lit(float(_CHUNK_STRIDE))),
    )
    e = staged.select(
        "doc_id",
        "toks",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    chunk = F.slice(
        F.col("toks"),
        (start + 1).cast("int"),
        F.least(F.lit(CHUNK_TOKENS).cast("long"), F.col("n") - start).cast(
            "int"
        ),
    )
    return e.select(
        "doc_id",
        "chunk_idx",
        F.least(
            F.lit(CHUNK_TOKENS).cast("long"), F.col("n") - start
        ).alias("n_tokens"),
        portable_hash64(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


# --------------------------------------------------------------------------
# Collocation mining: pointwise mutual information between vocabulary
# tokens over document co-presence -- the association score behind
# phrase detection and topic seeding in a curation pipeline (PMI >> 0
# means the pair co-occurs far above chance; the classic Church & Hanks
# collocation measure). The pair space is bounded BY CONSTRUCTION to
# the top-PMI_VOCAB vocabulary, so the self-join is domain-sized no
# matter the corpus.
# --------------------------------------------------------------------------

#: Vocabulary cap for the pair space (<= V*(V-1)/2 candidate pairs) and
#: the minimum co-document support a reported pair needs.
PMI_VOCAB = 100
PMI_MIN_SUP = 3

#: PMI closed form over exact integer counts, one shared text (the
#: q_source_divergence precedent for ln over shared-rounded inputs).
_PMI = (
    "ln((CAST(n_both AS DOUBLE) * CAST(n_docs AS DOUBLE))"
    " / (CAST(df1 AS DOUBLE) * CAST(df2 AS DOUBLE)))"
)


@query(
    "q_pmi",
    oracle=f"""
    WITH presence AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS token
        FROM documents
      )
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM presence),
    vocab AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df
      FROM presence GROUP BY 1
      ORDER BY df DESC, token
      LIMIT {PMI_VOCAB}
    ),
    fp AS (
      SELECT p.doc_id, p.token, v.df
      FROM presence p JOIN vocab v ON v.token = p.token
    ),
    pairs AS (
      SELECT a.token AS token_1, b.token AS token_2,
             CAST(MAX(a.df) AS BIGINT) AS df1,
             CAST(MAX(b.df) AS BIGINT) AS df2,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM fp a JOIN fp b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
      HAVING COUNT(*) >= {PMI_MIN_SUP}
    )
    SELECT token_1, token_2, df1, df2, n_both,
           ROUND({_PMI}, 6) AS pmi
    FROM pairs CROSS JOIN nd
    """,
)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between top-{PMI_VOCAB} vocabulary
    tokens over document co-presence: every pair co-occurring in at
    least {PMI_MIN_SUP} documents, with both document frequencies and
    ln(P(a,b) / (P(a)P(b))) over the exact integer counts.

    Bounded-pair-space discipline (the q_cooccur argument, applied to
    text): (1) DISTINCT (doc, token) presence -- one mergeable
    exchange, the corpus-proportional step; (2) the vocabulary is the
    top-{PMI_VOCAB} tokens under the deterministic (df DESC, token)
    total order -- a TakeOrdered, broadcast everywhere downstream, so
    the per-document basket after the vocabulary semi-join is <=
    {PMI_VOCAB} tokens and the doc-keyed self-join enumerates at most
    V*(V-1)/2 distinct pairs regardless of corpus size; (3) marginals
    ride the broadcast vocabulary, the count aggregation is mergeable,
    and the only float is the final shared-text ln (round-6, the
    q_source_divergence precedent).

    Scale: the presence distinct bounds everything -- pair enumeration
    rows grow with corpus size but collapse map-side to the fixed
    vocabulary-pair domain; no shuffle ever carries more than
    (doc x vocab-presence) rows. Hour-grain windows or per-source PMI
    are a groupBy-key swap.

    tests/test_batch_fns.py recomputes PMI for the top pair in pure
    Python (third-engine check) and pins symmetry-free ordering
    (token_1 < token_2) and support >= {PMI_MIN_SUP}.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Lazy localCheckpoint: presence feeds THREE consumers (the doc
    # count, the vocabulary ranking, and the filtered pair stream) and
    # fp feeds both self-join sides -- round-13 A/B: removing the
    # checkpoints re-ran the corpus explode (executed records doubled
    # at the pin scale; 1.24 -> 1.48 s at sf0.1), so they stay; at
    # cluster scale prefer reliable checkpoint().
    presence = (
        docs.select(
            "doc_id", F.explode(tokens_col()).alias("token")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_docs = presence.select(
        F.countDistinct("doc_id").alias("n_docs")
    )
    vocab = (
        presence.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(PMI_VOCAB)
    )
    fp = (
        presence.join(F.broadcast(vocab), "token")
        .select("doc_id", "token", "df")
        .localCheckpoint(eager=False)
    )
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("token_1"),
            F.col("b.token").alias("token_2"),
        )
        .agg(
            F.max("a.df").alias("df1"),
            F.max("b.df").alias("df2"),
            F.count(F.lit(1)).alias("n_both"),
        )
        .filter(F.col("n_both") >= PMI_MIN_SUP)
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "token_1",
        "token_2",
        "df1",
        "df2",
        "n_both",
        F.round(F.expr(_PMI), 6).alias("pmi"),
    )


# --------------------------------------------------------------------------
# Character-bigram entropy: the information-density quality signal
# (template/boilerplate text has low entropy, natural prose sits in a
# band, random noise saturates) -- the Shannon complement to
# q_repetition_score's top-share heuristic, computed with the house
# exact-count + sorted-fold discipline so the float is engine-stable.
# --------------------------------------------------------------------------

#: Per-bigram fold term and the entropy closed form over (n, s) with
#: s = fold of c*ln(c): H = ln(n) - s/n (nats). Shared texts; the fold
#: runs over the bigram-SORTED term list in both engines (the
#: q_source_divergence cosine-fold discipline).
_ENT_TERM = "CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))"
_ENT = "ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE)"
_ENT_RATIO = (
    "CASE WHEN vocab > 1 THEN"
    f" ({_ENT}) / ln(CAST(vocab AS DOUBLE)) ELSE 0.0 END"
)


@query(
    "q_text_entropy",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, length(text)),
               i -> substring(text, i, 2)
             )) AS b
      FROM documents WHERE length(text) >= 2
    ),
    c AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2
    ),
    folded AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             list_reduce(
               list_prepend(0.0, list({_ENT_TERM} ORDER BY b)),
               (acc, x) -> acc + x
             ) AS s
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_bigrams, vocab AS distinct_bigrams,
           ROUND({_ENT}, 6) AS entropy,
           ROUND({_ENT_RATIO}, 6) AS entropy_ratio
    FROM folded
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each document's character-bigram
    distribution, with the bigram count, distinct-bigram vocabulary,
    and the [0, 1] ratio against the uniform maximum ln(vocab) --
    the quality gate that catches template spam (low ratio) and
    mojibake/noise (ratio near 1 with a bloated vocabulary) that
    token-level filters miss.

    Exactness: the identity H = ln(n) - (1/n) * sum c*ln(c) needs ONE
    float reduction, and it folds the c*ln(c) terms in bigram-sorted
    order with a 0.0 seed in both engines (adding to a 0.0 seed is
    exact, so the fold orders are identical; the q_source_divergence
    discipline). The per-term text and both closed forms are shared
    SQL, rounded to 6.

    Scale -- ZERO-EXCHANGE since round 10: a document's bigram
    distribution is a per-row fact, so the whole computation is one
    narrow codegen'd projection -- ``array_sort`` the row's bigrams,
    then a single ``aggregate`` run-length scan closes each run of
    equal bigrams by adding its c*ln(c) term. Closing runs while
    scanning the SORTED array adds exactly the oracle's
    ``list(c*ln(c) ORDER BY b)`` terms in the same order, so the
    rewrite is a physical change only (the r9 plan exploded corpus x
    length rows through two hash exchanges to group what was never
    cross-row data; oracle and output are unchanged, and the r9 row's
    hash certifies the same values). Nothing leaves the row: no
    Generate, no shuffle, text never rides an exchange at all.

    tests/test_batch_fns.py recomputes the entropy for every doc in
    pure Python (third-engine check) and pins 0 <= ratio <= 1 and
    entropy <= ln(vocab); tests/test_plans.py pins the
    exchange-and-generate-free plan.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # The fold lambda names its element ``c``, so the shared per-term
    # text applies verbatim.
    term = _ENT_TERM
    # Three staged projections over PRIMITIVE arrays (a struct
    # accumulator per element measured ~20% slower): the sorted bigram
    # array A, the 1-based run-END positions E (boundaries of equal
    # runs in A; IF, not OR, so the out-of-range probe at i = size(A)
    # is never evaluated -- ANSI mode throws on it), run lengths R as
    # adjacent differences of E, then one primitive fold over R adds
    # the oracle's c*ln(c) terms in the identical sorted order.
    staged = docs.filter(F.length("text") >= 2).select(
        "doc_id",
        (F.length("text") - 1).cast("long").alias("n"),
        F.expr(
            "array_sort(transform(sequence(1, length(text) - 1),"
            " i -> substring(text, i, 2)))"
        ).alias("A"),
    )
    ends = staged.select(
        "doc_id",
        "n",
        F.expr(
            "filter(sequence(1, size(A)),"
            " i -> IF(i = size(A), true, A[i - 1] <> A[i]))"
        ).alias("E"),
    )
    runs = ends.select(
        "doc_id",
        "n",
        F.size("E").cast("long").alias("vocab"),
        F.expr(
            "transform(sequence(1, size(E)),"
            " j -> E[j - 1] - IF(j = 1, CAST(0 AS BIGINT), E[j - 2]))"
        ).alias("R"),
    )
    folded = runs.select(
        "doc_id",
        "n",
        "vocab",
        F.expr(
            "aggregate(R, CAST(0.0 AS DOUBLE),"
            f" (acc, c) -> acc + {term})"
        ).alias("s"),
    )
    return folded.select(
        "doc_id",
        F.col("n").alias("n_bigrams"),
        F.col("vocab").alias("distinct_bigrams"),
        F.round(F.expr(_ENT), 6).alias("entropy"),
        F.round(F.expr(_ENT_RATIO), 6).alias("entropy_ratio"),
    )
