"""Pluggable commit arbiter (plans/snapshots.py Catalog seam, round
13): the latest-pointer CAS is the protocol's ONLY mutable state, so a
catalog is two methods -- and a table bound to :class:`SqliteCatalog`
must keep every snapshot guarantee with the database, not an advisory
flock, serializing commits."""

from __future__ import annotations

import json
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from dump1090_stream_parser_spark.plans.snapshots import (
    SnapshotConflict,
    SqliteCatalog,
    bind_catalog,
    catalog_for,
    latest_manifest,
    manifest_for,
    read_snapshot,
    snapshot_append,
    snapshot_upsert,
    snapshot_write,
    vacuum,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR
from .test_snapshots import _race_commits


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _bind_sqlite(tmp_path, name="tbl") -> str:
    t = str(tmp_path / name)
    bind_catalog(t, {"type": "sqlite", "db": "../catalog.db"})
    return t


def test_sqlite_catalog_full_lifecycle(spark, tmp_path):
    """write / upsert / append / read / time travel / vacuum, all
    arbitered by the database: the _LATEST file never exists, the
    pointer lives in the catalog db, and every read dispatches
    through the binding."""
    t = _bind_sqlite(tmp_path)
    df = _orders(spark)
    lo = df.filter(F.col("o_orderkey") <= 1000)
    assert snapshot_write(spark, t, lo, part_col="o_orderpriority") == 0
    assert not os.path.exists(os.path.join(t, "_LATEST"))
    assert latest_manifest(t)["version"] == 0
    patch = lo.limit(200).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    snapshot_upsert(spark, t, patch, key_col="o_orderkey")
    snapshot_append(spark, t, df.filter(F.col("o_orderkey") > 1000))
    got = read_snapshot(spark, t)
    want = df.join(
        patch.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(patch)
    assert _rows(got) == _rows(want)
    assert _rows(read_snapshot(spark, t, version=0)) == _rows(lo)
    # vacuum keeps walking the commit chain through the db pointer
    vacuum(t, keep=2)
    assert _rows(read_snapshot(spark, t)) == _rows(want)


def test_sqlite_catalog_cas_rejects_stale_base(tmp_path):
    t = _bind_sqlite(tmp_path)
    cat = catalog_for(t)
    assert isinstance(cat, SqliteCatalog)
    m0 = {"version": 0, "base_version": None, "files": []}
    cat.publish(t, m0, None)
    with pytest.raises(SnapshotConflict):
        cat.publish(t, {"version": 1, "base_version": None, "files": []}, None)
    cat.publish(t, {"version": 1, "base_version": 0, "files": []}, 0)
    assert cat.latest(t)["version"] == 1


def test_binding_is_write_once(spark, tmp_path):
    t = _bind_sqlite(tmp_path)
    # same spec re-bind is an idempotent no-op
    bind_catalog(t, {"type": "sqlite", "db": "../catalog.db"})
    with pytest.raises(ValueError, match="split the commit arbiter"):
        bind_catalog(t, {"type": "fs"})
    # an already-committed fs table refuses a late binding
    t2 = str(tmp_path / "committed")
    snapshot_write(spark, t2, _orders(spark).limit(5), part_col=None)
    with pytest.raises(ValueError, match="before the first commit"):
        bind_catalog(t2, {"type": "sqlite", "db": "cat.db"})


def test_unknown_catalog_type_is_loud(tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(t)
    with open(os.path.join(t, "_CATALOG.json"), "w") as f:
        json.dump({"type": "zookeeper"}, f)
    with pytest.raises(ValueError, match="unknown catalog type"):
        catalog_for(t)


def test_crashed_writer_transaction_rolls_back(tmp_path):
    """A writer that dies inside BEGIN IMMEDIATE must not wedge the
    table: closing its connection rolls the transaction back (the
    flock-release analog), and the next publish proceeds."""
    t = _bind_sqlite(tmp_path)
    cat = catalog_for(t)
    cat.publish(t, {"version": 0, "base_version": None, "files": []}, None)
    dead = sqlite3.connect(cat.db_path, timeout=1.0)
    dead.execute("BEGIN IMMEDIATE")
    dead.execute(
        "UPDATE snapshot_latest SET version = 99"
    )
    dead.close()  # crash: uncommitted write lock released, work undone
    cat.publish(t, {"version": 1, "base_version": 0, "files": []}, 0)
    assert cat.latest(t)["version"] == 1


def test_sqlite_catalog_serializes_across_processes(tmp_path):
    """The multi-writer claim, database-arbitered: the same N-process
    OCC commit race the flock test runs, but through the SqliteCatalog
    binding -- the final base_version chain must be linear with every
    commit present exactly once, with NO flock in the publish path."""
    import multiprocessing as mp

    t = _bind_sqlite(tmp_path)
    n_procs, n_commits = 4, 5
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_race_commits, args=(t, i, n_commits))
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
    assert all(p.exitcode == 0 for p in procs), [
        p.exitcode for p in procs
    ]
    # no flock arbitration happened: the fs lock file was never made
    assert not os.path.exists(os.path.join(t, "_COMMIT_LOCK"))
    chain = [latest_manifest(t)]
    assert chain[0] is not None
    while chain[-1]["base_version"] is not None:
        chain.append(manifest_for(t, chain[-1]["base_version"]))
    assert len(chain) == n_procs * n_commits
    seen = [
        (m["txns"]["proc"], m["txns"]["k"])
        for m in chain
        if m.get("txns")
    ]
    assert sorted(seen) == sorted(
        (i, k) for i in range(n_procs) for k in range(n_commits)
    )
