"""Plan-shape snapshot: a physical-plan signature for every registered
query, pinned to docs/PLAN_SNAPSHOT.json.

The hand-written tests in tests/test_plans.py pin the plans that embody
a deliberate design decision; this tool pins EVERYTHING ELSE against
accidental regression -- an innocent refactor that adds an exchange, a
join that silently flips to nested-loop, an explode that sneaks into a
narrow map. The signature is deliberately coarse (operator counts, not
plan text) so it survives cosmetic planner changes while catching the
shapes that matter at 100 TB.

Regenerate after an INTENTIONAL plan change:

    python tools/plan_snapshot.py > docs/PLAN_SNAPSHOT.json

and review the diff like code: every changed count needs a reason.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

#: Queries whose plan depends on driver-side iteration state; their
#: shape is covered by dedicated tests instead.
SKIP = {"q_dedup_clusters", "q_dedup_clusters_lsh"}


def signature(plan: str) -> dict:
    final = plan.split("== Initial Plan ==")[0]
    return {
        "exchanges": final.count(") Exchange"),
        "generates": final.count(") Generate"),
        "broadcast_joins": final.count("BroadcastHashJoin"),
        "sort_merge_joins": final.count("SortMergeJoin"),
        "shuffled_hash_joins": final.count("ShuffledHashJoin"),
        "nested_loop_joins": final.count("BroadcastNestedLoopJoin")
        + final.count("CartesianProduct"),
        "top_k": final.count("TakeOrderedAndProject"),
        "window": final.count(") Window"),
    }


def build_snapshot(spark) -> dict[str, dict]:
    import __spark_entry__ as e
    from dump1090_stream_parser_spark.plans.inspect import formatted_plan

    out = {}
    for name, fn in sorted(e.queries().items()):
        if name in SKIP:
            continue
        out[name] = signature(formatted_plan(fn(spark, SF_DIR)))
    return out


def main() -> None:
    from dump1090_stream_parser_spark.session import get_spark

    # same session shape as tests/conftest.py -- broadcast decisions
    # depend on the threshold, and the snapshot must be regenerable in
    # the exact environment the test compares under
    spark = get_spark(
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(build_snapshot(spark), indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
