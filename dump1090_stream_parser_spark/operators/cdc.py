"""Tier C extension: CDC changelog application -- MERGE/upsert-apply
semantics (SURVEY.md §2 north-star adjacency: every lakehouse
training-data pipeline ingests change streams, and "apply the
changelog to the snapshot" is the primitive behind Delta/Iceberg
MERGE, compaction, and incremental materialization).

The events stream doubles as a deterministic changelog: signup
inserts a key, error deletes it, every other event upserts the
payload. Applying it means per-key last-writer-wins with DELETE
tombstones honored -- one user-keyed window pass, no iteration.

The algebra that matters at scale is INCREMENTALITY: apply(log) ==
apply(apply(first half) + second half). tests/test_cdc.py pins that
two-phase merge equivalence exactly (the q_rollup_merge discipline
applied to keyed state instead of additive aggregates).

Reference parity note: the reference script has no change-data
operator (its sink is INSERT-only SQLite); this module is part of the
mandated training-data extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table
from .registry import query

#: Deterministic event_type -> changelog op mapping (shared text).
_OP = (
    "CASE WHEN event_type = 'signup' THEN 'I'"
    " WHEN event_type = 'error' THEN 'D'"
    " ELSE 'U' END"
)


def changelog_state(log: DataFrame) -> DataFrame:
    """Fold a changelog of (user_id, ts, event_id, op, value) rows into
    per-key state: last-writer-wins in (ts, event_id) order, KEEPING
    delete tombstones (last_op = 'D') so states stay mergeable -- a
    tombstoned key must survive in state, or a later increment could
    not distinguish "never existed" from "deleted, counts carried".

    One window pass computes the per-key rank and op counts together
    (single exchange on user_id); the rn = 1 filter is Spark's
    WindowGroupLimit shape, so per-key work is top-1, not a full sort
    materialization per consumer.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wall = Window.partitionBy("user_id")
    ranked = log.select(
        "user_id",
        "op",
        "value",
        "ts",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .over(wall)
        .alias("n_deletes"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("n_ops").cast("long").alias("n_ops"),
        F.col("n_deletes").cast("long").alias("n_deletes"),
        F.col("op").alias("last_op"),
        F.col("value").alias("current_value"),
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
    )


def merge_states(old: DataFrame, new: DataFrame) -> DataFrame:
    """Combine two changelog states (disjoint or not in time): counts
    add, and the last-writer fields come from whichever side saw the
    later (ts, event_id). This is the associative merge that lets a
    100 TB table maintain state from increments -- tests/test_cdc.py
    pins merge(state(older), state(newer)) == state(all) exactly.
    """
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(
        n, o.o_user_id == n.n_user_id, "full_outer"
    )
    new_wins = F.col("o_last_ts").isNull() | (
        F.col("n_last_ts").isNotNull()
        & (
            (F.col("n_last_ts") > F.col("o_last_ts"))
            | (
                (F.col("n_last_ts") == F.col("o_last_ts"))
                & (F.col("n_last_event_id") > F.col("o_last_event_id"))
            )
        )
    )

    def pick(col: str):
        return F.when(new_wins, F.col(f"n_{col}")).otherwise(
            F.col(f"o_{col}")
        )

    zero = F.lit(0).cast("long")
    return j.select(
        F.coalesce("o_user_id", "n_user_id").alias("user_id"),
        (
            F.coalesce("o_n_ops", zero) + F.coalesce("n_n_ops", zero)
        ).alias("n_ops"),
        (
            F.coalesce("o_n_deletes", zero)
            + F.coalesce("n_n_deletes", zero)
        ).alias("n_deletes"),
        pick("last_op").alias("last_op"),
        pick("current_value").alias("current_value"),
        pick("last_ts").alias("last_ts"),
        pick("last_event_id").alias("last_event_id"),
    )


def apply_changelog(log: DataFrame) -> DataFrame:
    """Live view of :func:`changelog_state`: tombstoned keys dropped,
    internal merge bookkeeping (last_event_id) projected away."""
    return changelog_state(log).filter(F.col("last_op") != "D").drop(
        "last_event_id"
    )


@query(
    "q_cdc_apply",
    oracle=f"""
    WITH log AS (
      SELECT user_id, ts, event_id, {_OP} AS op, value
      FROM events
    ),
    ranked AS (
      SELECT user_id, op, value, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
             SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS n_deletes
      FROM log
    )
    SELECT user_id,
           CAST(n_ops AS BIGINT) AS n_ops,
           CAST(n_deletes AS BIGINT) AS n_deletes,
           op AS last_op,
           value AS current_value,
           ts AS last_ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current table state after applying the event changelog: one row
    per LIVE key (last op is an insert/upsert, not a delete), with the
    op counts that produced it.

    The MERGE-apply primitive: ops fold per key in (ts, event_id)
    order -- the unique event_id tiebreaker makes last-writer-wins
    total and engine-independent -- and a key whose final op is a
    DELETE tombstone vanishes, however many upserts preceded it. The
    payload double is carried VERBATIM from the scan to the result (no
    arithmetic), so cross-engine hashing is exact by construction.

    One exchange: rank, op count, and delete count all ride the same
    user_id window partitioning; the rn = 1 filter lowers to
    WindowGroupLimit (top-1 per key, no per-key full sort
    materialization -- the q_window_latest plan shape, which this
    operator extends with tombstone semantics).

    Scale: applying a changelog is associative over TIME SEGMENTS --
    apply(log) == apply(apply(older half) projected back to synthetic
    ops + newer half) -- which is what lets a 100 TB table maintain
    state from daily increments instead of replaying history
    (tests/test_cdc.py pins the equivalence exactly, the
    q_rollup_merge discipline for keyed state). A streaming twin
    keeps (last_ts, last_op, value, counts) per key -- O(live keys)
    state with O(1) merge per arrival.
    """
    events = load_table(spark, sf_dir, "events")
    log = events.select(
        "user_id", "ts", "event_id", F.expr(_OP).alias("op"), "value"
    )
    return apply_changelog(log)
