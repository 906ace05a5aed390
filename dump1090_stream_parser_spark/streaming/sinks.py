"""Optional drop-in parity sink: SQLite.

The reference's output artifact is ``adsb_messages.db`` with one
``squitters`` table (Appendix A L35-L62); downstream users point the
sqlite3 CLI at it. For drop-in migration this sink writes the same
artifact from a foreachBatch stream -- micro-batch INSERTs inside one
transaction reproduce the reference's ``--batch-size`` batched-commit
behavior (Appendix A L134-L140) with the batch boundary now defined by
the trigger interval.

Scale note: SQLite is a single-writer file -- this sink exists for
parity/migration, not scale. The parquet sink in pipeline.py is the
real path; this one funnels through the driver deliberately
(toPandas), which is fine at SBS-1 rates (<= a few k rows/s).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame

from ..sources.sbs1 import SBS1_FIELDS

#: Reference DDL (Appendix A L37-L61), byte-compatible for sqlite3 users.
SQUITTERS_SQLITE_DDL = """
CREATE TABLE IF NOT EXISTS squitters (
    message_type TEXT, transmission_type INT, session_id INT,
    aircraft_id INT, hex_ident TEXT, flight_id INT,
    generated_date TEXT, generated_time TEXT, logged_date TEXT,
    logged_time TEXT, callsign TEXT, altitude INT, ground_speed REAL,
    track REAL, lat REAL, lon REAL, vertical_rate REAL, squawk TEXT,
    alert INT, emergency INT, spi INT, is_on_ground INT,
    parsed_time TEXT
)
"""

_COLS = [name for name, _ in SBS1_FIELDS] + ["parsed_time"]


def write_sqlite_batch(
    silver_batch: DataFrame, db_path: str, batch_id: int | None = None
) -> int:
    """Append one micro-batch of Silver rows to the SQLite parity DB.

    Use inside foreachBatch:
        write_silver-style fn that calls
        ``write_sqlite_batch(silver(batch), "adsb_messages.db", batch_id)``.
    Returns rows written. One transaction per micro-batch = the
    reference's batched commit -- and when ``batch_id`` is given, the
    batch-ledger insert rides in the SAME transaction, so a re-delivered
    micro-batch is skipped instead of double-inserted (exactly-once; the
    reference's lock-retry path could double-insert).
    """
    pdf = silver_batch.select(*_COLS).toPandas()
    pdf["parsed_time"] = pdf["parsed_time"].map(
        lambda t: t.isoformat() if t is not None else None
    )
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(SQUITTERS_SQLITE_DDL)
        if batch_id is not None:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS _ingested_batches "
                "(batch_id INTEGER PRIMARY KEY)"
            )
            done = conn.execute(
                "SELECT 1 FROM _ingested_batches WHERE batch_id = ?",
                (batch_id,),
            ).fetchone()
            if done:
                return 0
            conn.execute(
                "INSERT INTO _ingested_batches VALUES (?)", (batch_id,)
            )
        placeholders = ",".join("?" * len(_COLS))
        conn.executemany(
            f"INSERT INTO squitters VALUES ({placeholders})",
            pdf.itertuples(index=False, name=None),
        )
        conn.commit()
    finally:
        conn.close()
    return len(pdf)


def upsert_batch_writer(base_dir: str, part_col: str, key_col: str, ts_col: str):
    """foreachBatch sink maintaining a materialized latest-state table:
    each micro-batch reduces to its newest row per key (max_by over
    ``ts_col``), then patches the partitioned parquet layout via
    :func:`...plans.layout.upsert_partitioned` -- only the partitions
    the batch touches get rewritten, so sink cost tracks batch size,
    not table size.

    Exactly-once via idempotence: replaying a micro-batch upserts the
    SAME (key, latest-row) set again, replacing rows with identical
    content -- the table is a pure function of the prefix of processed
    batches, so the offsets-then-sink commit race is harmless (same
    argument as the batch_id=N overwrite sink in pipeline.py, without
    needing batch ids in the layout).

    First delivery bootstraps the layout with a plain partitioned
    write."""
    import os

    from pyspark.sql import functions as F

    from ..plans.layout import upsert_partitioned

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        others = [
            c for c in batch_df.columns if c not in (key_col, ts_col)
        ]
        latest = batch_df.groupBy(key_col).agg(
            F.max(ts_col).alias(ts_col),
            *[
                F.max_by(c, F.col(ts_col)).alias(c)
                for c in others
            ],
        ).select(batch_df.columns)
        spark = batch_df.sparkSession
        if not os.path.isdir(base_dir):
            latest.write.partitionBy(part_col).parquet(base_dir)
            return
        upsert_partitioned(spark, base_dir, latest, part_col, key_col)

    return write
