"""Every query's physical-plan signature must match the pinned
snapshot (docs/PLAN_SNAPSHOT.json) -- the broad-coverage complement to
the hand-written pins in test_plans.py. A failure here means a plan
SHAPE changed: regenerate with `python tools/plan_snapshot.py >
docs/PLAN_SNAPSHOT.json` only if the change was intentional, and say
why in the commit."""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as entry_mod
from dump1090_stream_parser_spark.plans.inspect import formatted_plan

import sys

sys.path.insert(0, "/root/repo/tools")
from plan_snapshot import SKIP, signature  # noqa: E402

from .conftest import SF_DIR

with open("/root/repo/docs/PLAN_SNAPSHOT.json") as f:
    SNAPSHOT = json.load(f)

QUERIES = entry_mod.queries()


def test_snapshot_covers_every_query():
    assert set(SNAPSHOT) == set(QUERIES) - SKIP


@pytest.mark.parametrize("name", sorted(SNAPSHOT))
def test_plan_signature_unchanged(spark, name):
    got = signature(formatted_plan(QUERIES[name](spark, SF_DIR)))
    assert got == SNAPSHOT[name], (
        f"{name}: plan shape drifted (see tools/plan_snapshot.py header)"
    )
