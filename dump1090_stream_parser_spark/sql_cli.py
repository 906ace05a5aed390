"""The query half of the reference workflow: ``sqlite3 adsb_messages.db
"SELECT ..."`` becomes

    python -m dump1090_stream_parser_spark.sql_cli \\
        -d ./adsb_out "SELECT hex_ident, COUNT(*) c FROM squitters
                       GROUP BY hex_ident ORDER BY c DESC LIMIT 10"

The Silver parquet directory written by the ingest CLI registers as the
``squitters`` view (same table name the reference's users query);
``--sf-dir`` additionally registers the testdata tables (region nation
customer supplier part orders lineitem events documents embeddings) so
any oracle-checked query from the catalog can be run ad hoc. Output is
CSV on stdout (header included), the closest analog of the sqlite3
shell's default mode that survives piping.
"""

from __future__ import annotations

import argparse
import sys


def build_sql_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dump1090-stream-parser-spark sql",
        description="run SQL over the ingested squitters table "
        "(and optionally the testdata tables)",
    )
    p.add_argument("query", help="SQL text, or '-' to read from stdin")
    p.add_argument("-d", "--database", default="./adsb_out",
                   help="Silver parquet directory (registered as view "
                        "'squitters')")
    p.add_argument("--sf-dir", default=None,
                   help="also register the testdata tables from this "
                        "directory")
    p.add_argument("--sqlite-db", default=None,
                   help="register a reference-written SQLite file's "
                        "squitters table as view 'squitters_db' "
                        "(parallel rowid-range scans)")
    p.add_argument("--snapshot-table", default=None, metavar="DIR",
                   help="register a snapshot-manifest table "
                        "(plans/snapshots.py) as view 'snapshot' -- "
                        "latest version unless --version/--as-of")
    p.add_argument("--version", type=int, default=None,
                   help="time travel: read this snapshot version "
                        "(with --snapshot-table)")
    p.add_argument("--range", dest="ranges", nargs=3, default=None,
                   action="append", metavar=("COL", "LO", "HI"),
                   help="file-skip the snapshot read to files whose "
                        "recorded min/max overlap [LO, HI] on COL "
                        "('-' = unbounded side; repeatable; numeric "
                        "bounds auto-cast). Pruning is file-grain -- "
                        "keep the WHERE clause in the query.")
    p.add_argument("--history", action="store_true",
                   help="print the snapshot version history (newest "
                        "first) instead of running a query (with "
                        "--snapshot-table)")
    p.add_argument("--changes-from", type=int, default=None,
                   metavar="V",
                   help="register rows ADDED after snapshot version V "
                        "as view 'changes' (append-only ranges; with "
                        "--snapshot-table)")
    p.add_argument("--changes-to", type=int, default=None, metavar="V",
                   help="end version for --changes-from "
                        "(default: latest)")
    p.add_argument("--as-of", default=None, metavar="TS",
                   help="time travel: newest version committed at or "
                        "before this ISO-8601 UTC timestamp "
                        "(with --snapshot-table)")
    p.add_argument("--limit", type=int, default=None,
                   help="cap output rows (omit for all)")
    p.add_argument("--master", default="local[*]")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_sql_parser().parse_args(argv)
    sql = sys.stdin.read() if args.query == "-" else args.query

    if args.snapshot_table and args.history:
        import csv

        from .plans.snapshots import snapshot_history

        w = csv.writer(sys.stdout)
        w.writerow(
            ["version", "committed_at", "base_version", "n_files",
             "n_rows"]
        )
        for h in snapshot_history(args.snapshot_table):
            w.writerow([h["version"], h["committed_at"],
                        h["base_version"], h["n_files"], h["n_rows"]])
        return

    from .session import get_spark
    from .tables import TABLES, load_table

    spark = get_spark(master=args.master, app_name="sbs1-sql")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        # the ingest CLI's layout: squitters/batch_id=N/parsed_date=D/
        # (both surface as partition columns on read)
        spark.read.parquet(
            f"{args.database}/squitters"
        ).createOrReplaceTempView("squitters")
    except Exception:  # noqa: BLE001 -- no ingest output yet is fine
        pass
    if args.sf_dir:
        for t in TABLES:
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
    if args.sqlite_db:
        # the migration bridge: query years of reference history and
        # the new Silver table side by side (e.g. UNION/anti-join them)
        from .sources.sqlite_source import register_sqlite_source

        register_sqlite_source(spark)
        (
            spark.read.format("sqlite")
            .option("path", args.sqlite_db)
            .option("table", "squitters")
            .load()
            .createOrReplaceTempView("squitters_db")
        )

    if args.snapshot_table:
        # the reference's query half reads the continuously-written
        # table; the snapshot protocol adds pinned versions -- expose
        # them here so time travel is one flag, not a Python session
        from .plans.snapshots import read_snapshot, version_as_of

        if args.version is not None and args.as_of is not None:
            raise SystemExit("--version and --as-of are exclusive")
        version = args.version
        if args.as_of is not None:
            version = version_as_of(args.snapshot_table, args.as_of)
        ranges = None
        if args.ranges:
            def bound(v):
                if v == "-":
                    return None
                try:
                    return int(v)
                except ValueError:
                    try:
                        return float(v)
                    except ValueError:
                        return v
            ranges = {
                c: (bound(lo), bound(hi)) for c, lo, hi in args.ranges
            }
        read_snapshot(
            spark, args.snapshot_table, version=version, ranges=ranges
        ).createOrReplaceTempView("snapshot")
        if args.changes_from is not None:
            from .plans.snapshots import snapshot_changes

            snapshot_changes(
                spark, args.snapshot_table, args.changes_from,
                args.changes_to,
            ).createOrReplaceTempView("changes")

    df = spark.sql(sql)
    if args.limit is not None:
        df = df.limit(args.limit)
    df.toPandas().to_csv(sys.stdout, index=False)


if __name__ == "__main__":
    main()
