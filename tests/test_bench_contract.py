"""bench.py must keep emitting the driver's exact one-line JSON contract:
{"metric", "value", "unit", "queries", "sf"} -- guarded here at sf0.001
so a future edit cannot silently break the per-round BENCH recording."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_driver_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert set(payload) == {
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "reps",
        "value_mean",
        "queries_mean",
    }
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["sf"] == 0.001
    assert len(payload["queries"]) >= 20
    assert all(v >= 0 for v in payload["queries"].values())
    # min-of-n discipline: value is the min total, mean emitted alongside
    assert payload["reps"] >= 1
    assert payload["value"] <= payload["value_mean"] + 1e-9
    assert payload["queries"].keys() == payload["queries_mean"].keys()
    for name, vmin in payload["queries"].items():
        assert vmin <= payload["queries_mean"][name] + 1e-9
