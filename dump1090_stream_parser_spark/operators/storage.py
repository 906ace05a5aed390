"""Storage-layout-certified queries (VERDICT r12 asks #2/#6/#8): the
physical-layout levers the repo documents for the 100 TB tier,
registered as FULL-ORACLE queries so the driver certifies their
VALUES, and exec-pinned so the executed-stage meter certifies their
SHUFFLE-FREEDOM.

- :func:`q_bucket_join` -- the co-bucketed fact-fact join
  (plans/layout.write_bucketed): lineitem and orders bucketed by
  orderkey at write time, joined and aggregated with ZERO exchange
  end to end. This is the one big join-at-scale lever (at 100 TB the
  lineitem x orders shuffle dominates every star query; bucketing
  moves it out of every query into the one-time layout job), and the
  exec pin in tests/test_storage.py proves the executed join moved
  zero shuffle records.
- :func:`q_snapshot_read` -- the snapshot-table protocol
  (plans/snapshots.py) as a registered read: version 0 and the
  upserted latest of a transactional table, time travel included,
  with the oracle rebuilding both states relationally from the
  source parquet.

Both build their at-rest artifact ONCE PER SESSION and reuse it (the
q_ann_pq_pruned precedent): the artifact is deterministic over the
immutable sf tables, so reuse is bit-identical and the bench's
min-of-n reps time the read path a deployment actually runs.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import scaled_int
from ..tables import load_table
from .registry import query

#: Where the session-built layouts live (one subdirectory per source
#: sf table, like the PQ/IVF layout root).
_STORAGE_ROOT = Path(__file__).resolve().parents[2] / "spark-warehouse"

#: (applicationId, sf_dir) pairs whose bucketed tables exist in THIS
#: session's catalog (saveAsTable registrations are session-scoped
#: even when the files persist).
_BUCKETED_BUILT: set[tuple[str, str]] = set()


def _sf_tag(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def _bucketed_pair(spark: SparkSession, sf_dir: str, n_buckets: int = 8):
    """lineitem + orders bucketed by orderkey, built once per
    (session, sf_dir) via plans/layout.write_bucketed -- sorted
    buckets, matching bucket counts, external tables under the repo
    warehouse so the layout survives a cwd change."""
    from ..plans.layout import write_bucketed

    tag = _sf_tag(sf_dir)
    li_name, o_name = f"li_bkt_{tag}", f"o_bkt_{tag}"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BUCKETED_BUILT:
        for name, table, bkey in (
            (li_name, "lineitem", "l_orderkey"),
            (o_name, "orders", "o_orderkey"),
        ):
            path = _STORAGE_ROOT / "bucketed" / tag / name
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            if (path / "_SUCCESS").exists():
                # the layout already exists on disk (deterministic
                # over the immutable sf tables): REGISTER it instead
                # of rebuilding -- a rebuild's overwrite deletes files
                # under any OTHER live session's cached listing (the
                # round-13 full-suite + foreground-pytest collision),
                # while registration is metadata-only
                cols = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in load_table(spark, sf_dir, table).schema
                )
                spark.sql(
                    f"CREATE TABLE {name} ({cols}) USING PARQUET"
                    f" CLUSTERED BY ({bkey}) SORTED BY ({bkey})"
                    f" INTO {n_buckets} BUCKETS"
                    f" LOCATION '{path}'"
                )
            else:
                write_bucketed(
                    load_table(spark, sf_dir, table),
                    name,
                    bkey,
                    n_buckets=n_buckets,
                    path=str(path),
                )
        _BUCKETED_BUILT.add(key)
    return spark.table(li_name), spark.table(o_name)


@query(
    "q_bucket_join",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           COUNT(*) AS n_items,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 97 = 0
    GROUP BY o_orderkey, o_orderpriority
    """,
)
def q_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed fact-fact join with ZERO exchange end to end
    (SURVEY.md §2.2 join tier; the plans/layout.py 100 TB lever,
    driver-certified): lineitem ⋈ orders on orderkey over tables
    bucketed+sorted by the key at write time, then a per-order
    aggregate that REUSES the bucket distribution.

    Plan: both scans carry ``SelectedBucketsCount``; the merge-hinted
    SortMergeJoin reads co-located buckets with no Exchange on either
    side (broadcast is declined by hint, since at the target scale
    neither fact side fits one); the groupBy(o_orderkey, ...) is
    satisfied by the same hash-clustering, so the whole plan executes
    with zero shuffle records -- pinned by the executed-stage meter in
    tests/test_storage.py, with the shuffled twin's record count
    recorded next to it in docs/SCALE.md.

    Scale: this is the one-time-layout amortization argument stated as
    a query: at 100 TB the per-query orderkey shuffle is THE dominant
    cost of every lineitem x orders join; bucketing both tables pays
    that shuffle once at write time, and every subsequent join/agg on
    the key runs scan->merge->agg with no exchange at all. Bucket
    count scales with the cluster (64+ in production; 8 here), and
    AQE never needs to touch a plan that moves no shuffle data.

    Exactness: revenue sums in exact integer cents x basis points
    (scaled_int, the q_join_star discipline), divided once.
    """
    li, orders = _bucketed_pair(spark, sf_dir)
    joined = (
        li.filter(F.col("l_orderkey") % 97 == 0)
        .hint("merge")
        .join(
            orders.filter(F.col("o_orderkey") % 97 == 0),
            li.l_orderkey == orders.o_orderkey,
        )
    )
    return joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.sum(
                scaled_int(F.col("l_extendedprice"))
                * scaled_int(1 - F.col("l_discount"))
            )
            / 10000.0
        ).alias("revenue"),
    )


#: (applicationId, sf_dir) -> snapshot table dir already verified by
#: THIS session. The on-disk table persists across sessions; the build
#: is deterministic (v0 = the documents table, v1 = the fixed patch),
#: so a later session just re-verifies the end state.
_SNAPSHOT_DOCS_BUILT: dict[tuple[str, str], str] = {}

#: The deterministic upsert patch: every 37th doc gets this added to
#: n_chars (a visible marker the oracle reproduces relationally).
_PATCH_MOD = 37
_PATCH_DELTA = 1_000_000


def _snapshot_docs_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.snapshots import (
        SnapshotConflict,
        latest_manifest,
        snapshot_upsert,
        snapshot_write,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SNAPSHOT_DOCS_BUILT:
        return _SNAPSHOT_DOCS_BUILT[key]
    tdir = str(_STORAGE_ROOT / "snapshot_docs" / _sf_tag(sf_dir))
    docs = load_table(spark, sf_dir, "documents")
    if latest_manifest(tdir) is None:
        try:
            snapshot_write(
                spark, tdir, docs, part_col="lang", expected_base=None
            )
        except SnapshotConflict:
            pass  # a concurrent builder won the v0 race; read its work
    if latest_manifest(tdir)["version"] == 0:
        patch = docs.filter(
            F.col("doc_id") % _PATCH_MOD == 0
        ).withColumn("n_chars", F.col("n_chars") + F.lit(_PATCH_DELTA))
        try:
            snapshot_upsert(spark, tdir, patch, key_col="doc_id")
        except SnapshotConflict:
            pass  # concurrent builder applied the same deterministic patch
    _SNAPSHOT_DOCS_BUILT[key] = tdir
    return tdir


@query(
    "q_snapshot_read",
    oracle=f"""
    SELECT 0 AS version, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 1 AS version, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % {_PATCH_MOD} = 0
                         THEN n_chars + {_PATCH_DELTA}
                         ELSE n_chars END) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table read WITH time travel as a registered query
    (plans/snapshots.py; the reference's query half runs over the
    continuously-written SQLite table -- this is the same read-over-
    transactional-store contract on the manifest protocol): version 0
    is the initial full write of ``documents`` partitioned by lang,
    version 1 a copy-on-write upsert patching every {_PATCH_MOD}th
    doc; the query aggregates BOTH versions from their immutable
    manifests, and the oracle rebuilds each state relationally from
    the source parquet -- so rows hash-match only if the snapshot
    protocol's versioning, partition-scoped rewrite, and by-reference
    file carry all preserved exact content.

    Scale: a reader resolves a manifest once and reads only immutable
    files (no lock against writers); the upsert rewrote ONLY the
    partitions its patch touched, carrying every other file by
    reference -- at 100 TB that is the difference between a
    patch-proportional commit and a table rewrite. Manifest-level
    pruning stats ride in the same file list (read_snapshot(parts=...)
    drops files driver-side).
    """
    tdir = _snapshot_docs_table(spark, sf_dir)
    from ..plans.snapshots import read_snapshot

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        ).select(
            F.lit(version).alias("version"),
            "lang",
            "n_docs",
            "total_chars",
        )

    return agg(read_snapshot(spark, tdir, version=0), 0).unionAll(
        agg(read_snapshot(spark, tdir, version=1), 1)
    )
