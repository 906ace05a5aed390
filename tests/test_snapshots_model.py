"""Model-based property test for the snapshot protocol
(plans/snapshots.py): random sequences of upserts and compactions
against a plain-dict reference model. After EVERY commit the live
table must equal the model, and at the end every retained version must
read back as the model state it had when that version committed --
the protocol's whole point (consistent snapshots under mutation)
stated as one machine-checked property instead of per-scenario
fixtures. Follows the repo's hypothesis discipline (the KMV/digest
merge-algebra precedent); example counts are small because each op is
a real Spark write."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dump1090_stream_parser_spark.plans.snapshots import (
    latest_manifest,
    read_snapshot,
    snapshot_compact,
    snapshot_upsert,
    snapshot_write,
    vacuum,
)

PARTS = ["a", "b", "c"]
KEYS = list(range(12))

#: partition-stable keys (the documented upsert contract): a key's
#: partition is a function of the key. The first run of this model
#: generated free (part, key) pairs and immediately falsified the
#: naive expectation -- an update moving key 0 from part 'a' to 'b'
#: leaves the stale row in 'a' carried by reference (duplicate key).
#: That hazard is now documented, strict-mode-detectable, and pinned
#: by test_strict_keys_detects_partition_movers below; the model
#: generates contract-compliant updates.
def _home(k: int) -> str:
    return PARTS[k % len(PARTS)]


_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=4, unique=True),
        st.integers(min_value=0, max_value=99),
    ),
    st.tuples(st.just("compact")),
    st.tuples(st.just("vacuum")),
    # additive schema evolution (VERDICT r12 ask #3): an upsert that
    # brings a brand-new column into the table with evolve_schema=True
    st.tuples(
        st.just("evolve"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True),
        st.integers(min_value=0, max_value=99),
    ),
)


def _read_as_dict(spark, table, version=None):
    df = read_snapshot(spark, table, version=version)
    cols = [c for c in df.columns if c != "key"]
    return {
        r["key"]: {c: r[c] for c in cols} for r in df.collect()
    }


def _schema_str(extras: list[str]) -> str:
    return "key long, part string, val int" + "".join(
        f", {c} int" for c in extras
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=2, max_size=5))
def test_random_histories_match_the_dict_model(spark, tmp_path_factory, ops):
    import copy

    table = str(tmp_path_factory.mktemp("snap_model") / "tbl")

    # initial state: even keys, each in its home partition
    init = [(k, _home(k), -1) for k in KEYS if k % 2 == 0]
    df0 = spark.createDataFrame(init, _schema_str([]))
    snapshot_write(spark, table, df0, part_col="part")
    extras: list[str] = []  # columns added by evolve ops, in order
    model = {k: {"part": p, "val": v} for k, p, v in init}
    history = {latest_manifest(table)["version"]: copy.deepcopy(model)}

    for op in ops:
        if op[0] == "upsert":
            _, keys, val = op
            rows = [
                tuple([k, _home(k), val] + [val] * len(extras))
                for k in keys
            ]
            upd = spark.createDataFrame(rows, _schema_str(extras))
            snapshot_upsert(
                spark, table, upd, key_col="key", strict_keys=True
            )
            for k in keys:
                model[k] = {"part": _home(k), "val": val}
                model[k].update({e: val for e in extras})
        elif op[0] == "evolve":
            _, keys, val = op
            name = f"x{len(extras)}"
            # rows not in this evolving commit read the new column as
            # NULL -- including rows in files carried by reference
            for k in model:
                model[k][name] = None
            extras.append(name)
            rows = [
                tuple([k, _home(k), val] + [val] * len(extras))
                for k in keys
            ]
            upd = spark.createDataFrame(rows, _schema_str(extras))
            snapshot_upsert(
                spark, table, upd, key_col="key", strict_keys=True,
                evolve_schema=True,
            )
            for k in keys:
                model[k] = {"part": _home(k), "val": val}
                model[k].update({e: val for e in extras})
        elif op[0] == "compact":
            snapshot_compact(spark, table, max_files_per_part=1)
            # no model change: compaction must be content-neutral
        else:
            # never removes anything a retained manifest references;
            # zero grace because every writer here has finished
            vacuum(table, keep=2, min_age_seconds=0)
            # versions older than the last 2 may now be gone
            live = sorted(history)[-2:]
            history = {v: s for v, s in history.items() if v in live}

        got = _read_as_dict(spark, table)
        assert got == model, (op, got, model)
        history[latest_manifest(table)["version"]] = copy.deepcopy(model)

    # time travel: every retained version reads back as the state the
    # model had when it committed (vacuum may have trimmed older ones,
    # compaction re-commits an identical state under a new version, and
    # a pre-evolution version must read its OWN narrower schema)
    import os

    for v, state in history.items():
        if not os.path.isdir(os.path.join(table, f"v{v}")):
            continue  # trimmed by an intervening vacuum
        assert _read_as_dict(spark, table, version=v) == state, v


def test_strict_keys_detects_partition_movers(spark, tmp_path):
    """The contract violation the model's first run exposed: an update
    that moves a key to a new partition. Non-strict mode cannot see the
    stale row (partition-scoped by design); strict mode pays a key-only
    scan of the untouched partitions and refuses loudly."""
    import pytest

    from dump1090_stream_parser_spark.plans.snapshots import (
        snapshot_upsert as upsert,
    )

    table = str(tmp_path / "tbl")
    df0 = spark.createDataFrame(
        [(0, "a", -1), (1, "b", -1)], "key long, part string, val int"
    )
    snapshot_write(spark, table, df0, part_col="part")
    mover = spark.createDataFrame(
        [(0, "b", 7)], "key long, part string, val int"
    )
    with pytest.raises(ValueError, match="partition"):
        upsert(spark, table, mover, key_col="key", strict_keys=True)
    # the table is unchanged -- the refused writer left only an
    # uncommitted orphan dir
    assert _read_as_dict(spark, table) == {
        0: {"part": "a", "val": -1},
        1: {"part": "b", "val": -1},
    }
