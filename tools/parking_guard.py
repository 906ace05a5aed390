"""Mechanized parking-claims guard (VERDICT r8 ask #5).

Every parked query's tail rationale asserts its code is unchanged
since its last green driver row -- a claim that was, until round 9,
maintained BY HAND. This tool checks it against git history:

1. For each parked query, find the round of its last green driver row
   (the CORRECTNESS_r*.json artifacts are the ledger).
2. Resolve that round's close commit (the driver artifacts land in a
   commit whose subject is "round N: verdict/advice/correctness/bench";
   the code it records is the tree the driver evaluated).
3. Extract the query's SOURCE BLOCK -- the @query decorator (which
   carries the oracle contract) through the end of the registered
   function -- from that commit's version of the module, and compare
   it to the working tree's block.
4. A changed block is a violation UNLESS the rationale acknowledges
   the CURRENT block by carrying its fingerprint -- the literal token
   ``block <8-hex>`` where the hex is sha256 of the current source
   block. The acknowledgement is self-maintaining: if the block drifts
   again, the fingerprint stops matching and the guard fails until a
   human re-reads the change and re-stamps the rationale.

Granularity is the function block, not the file: modules accrete new
operators every round, and a file-level diff would flag every parked
sibling of a new query. The block covers the decorator (oracle text)
and the function body; behavior drift through SHARED HELPERS is out of
scope here by design -- that is exactly what the full parity gate
(tests/test_parity.py, every round, every query) exists to catch. The
two checks compose: the guard pins the claim "this code is the code
the driver certified", the parity gate pins "whatever the code is, it
still matches the oracle".

    python tools/parking_guard.py          # report + exit code

tests/test_parking_guard.py runs check_parked() in the suite, so a
rotation that forgets to update a rationale fails CI locally.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"


def last_green_rounds(ledger_dir: str = REPO) -> dict[str, int]:
    """query -> newest round with a green (rows+schema+hash) row."""
    out: dict[str, int] = {}
    for path in glob.glob(f"{ledger_dir}/CORRECTNESS_r*.json"):
        n = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for q, v in rows.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("hash_match")
            ):
                out[q] = max(out.get(q, 0), n)
    return out


def current_round(ledger_dir: str = REPO) -> int:
    greens = last_green_rounds(ledger_dir)
    return (max(greens.values()) + 1) if greens else 1


def window_round() -> int:
    """The round the current window registration TARGETS
    (operators.WINDOW_ROUND, stamped as part of every rotation edit --
    VERDICT r10 ask #2). The drain invariant is evaluated at THIS
    round, so a freshly-landed ledger file flips the report to
    "rotation pending" instead of failing the suite at every round
    boundary."""
    import dump1090_stream_parser_spark.operators as ops

    return ops.WINDOW_ROUND


def rotation_pending(ledger_dir: str = REPO) -> bool:
    """True once the ledger has advanced past the round this window
    was registered for -- the loud-but-distinct boundary signal."""
    return current_round(ledger_dir) > window_round()


def round_commit(n: int) -> str | None:
    """The commit recording round n's driver artifacts (its tree is
    the code the round-n driver evaluated, plus the artifacts)."""
    got = subprocess.run(
        ["git", "log", "--format=%H", "-1", "--fixed-strings",
         "--grep", f"round {n}: verdict"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    return got or None


def _block(source: str, fn_name: str) -> str | None:
    """The decorator-through-function source block for ``fn_name``:
    from the nearest preceding top-level decorator (oracle contract
    included) to the next top-level statement."""
    lines = source.splitlines()
    start = None
    for i, line in enumerate(lines):
        if re.match(rf"def {re.escape(fn_name)}\(", line):
            start = i
            break
    if start is None:
        return None
    deco = start
    j = start - 1
    # walk up through the contiguous decorator block (its continuation
    # lines are indented; its openers start with @ at column 0)
    while j >= 0:
        line = lines[j]
        if line.startswith("@"):
            deco = j
            j -= 1
            continue
        if line.strip() == "" or line[:1] in (" ", ")", "]", "}"):
            j -= 1
            continue
        break
    end = len(lines)
    for i in range(start + 1, len(lines)):
        line = lines[i]
        if line and not line[0].isspace() and not line.startswith(")"):
            end = i
            break
    return "\n".join(lines[deco:end]).rstrip()


def _module_relpath(fn) -> str:
    import inspect

    path = inspect.getsourcefile(fn)
    return os.path.relpath(path, REPO)


def check_parked() -> list[dict]:
    """Violations: parked queries whose certified source block changed
    since their last green round without a rationale update."""
    import dump1090_stream_parser_spark.operators as ops

    greens = last_green_rounds()
    commits: dict[int, str | None] = {}
    violations: list[dict] = []
    for q, rationale in ops.EVAL_TAIL_RATIONALE.items():
        entry = ops.REGISTRY[q]
        r = greens.get(q)
        if r is None:
            # capability-held entries with no driver row of their own:
            # the rationale must say so (every such rationale names the
            # in-window holder and the parity gate)
            if "parity gate" not in rationale and "held" not in rationale:
                violations.append(
                    {"query": q, "reason": "no green row and no holder"}
                )
            continue
        if r not in commits:
            commits[r] = round_commit(r)
        commit = commits[r]
        if commit is None:
            continue  # history trimmed; nothing to diff against
        rel = _module_relpath(entry.fn)
        old = subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if old.returncode != 0:
            violations.append(
                {"query": q, "reason": f"module {rel} absent at r{r}"}
            )
            continue
        fn_name = entry.fn.__name__
        old_block = _block(old.stdout, fn_name)
        with open(os.path.join(REPO, rel)) as f:
            new_block = _block(f.read(), fn_name)
        if old_block is None:
            violations.append(
                {"query": q, "reason": f"{fn_name} absent at r{r}"}
            )
            continue
        if old_block != new_block:
            import hashlib

            stamp = hashlib.sha256(
                (new_block or "").encode()
            ).hexdigest()[:8]
            if f"block {stamp}" not in rationale:
                violations.append(
                    {
                        "query": q,
                        "reason": (
                            f"source block changed since green r{r};"
                            f" acknowledge with 'block {stamp}' in the"
                            " rationale after re-reading the change"
                        ),
                        "module": rel,
                    }
                )
    return violations


#: Green-age bound (VERDICT r9 ask #2): every registry entry must earn
#: a driver row at least once per MAX_GREEN_AGE rounds. The window
#: cannot hold everything at once, so the enforceable per-round form
#: is a DRAIN-RATE invariant: whenever parked entries are overdue, the
#: current window must devote at least the rotation quota
#: (ceil(tail / MAX_GREEN_AGE) slots) to overdue entries -- draining
#: oldest-first at the rate that makes the 5-round period hold in
#: steady state.
MAX_GREEN_AGE = 5


def green_ages(ledger_dir: str = REPO, at_round: int | None = None) -> dict[str, int | None]:
    """query -> rounds since its last green driver row (1 = green last
    round); None for entries with no green row yet. Ages are relative
    to ``at_round`` (default: the registration's WINDOW_ROUND, NOT the
    ledger-derived current round -- so the invariant below judges the
    window against the round it was built for)."""
    import dump1090_stream_parser_spark.operators as ops

    greens = last_green_rounds(ledger_dir)
    cur = window_round() if at_round is None else at_round
    return {
        q: (cur - greens[q]) if q in greens else None
        for q in ops.queries_map()
    }


def rotation_quota() -> int:
    import math

    import dump1090_stream_parser_spark.operators as ops

    tail = max(0, len(ops.queries_map()) - 50)
    return math.ceil(tail / MAX_GREEN_AGE)


def check_green_age(ledger_dir: str = REPO) -> list[dict]:
    """Violations of the green-age drain-rate invariant, evaluated AT
    THE WINDOW'S TARGET ROUND (VERDICT r10 ask #2). A new ledger file
    landing no longer fails this check -- that state is the distinct
    ``rotation_pending`` signal; what fails is (a) a window that does
    not meet its own round's drain quota, or (b) a registration left
    stale for a FULL round (ledger >= 2 rounds past WINDOW_ROUND --
    the driver evaluated the same window twice without a rotation)."""
    import dump1090_stream_parser_spark.operators as ops

    cur = current_round(ledger_dir)
    wr = window_round()
    if cur - wr >= 2:
        return [
            {
                "reason": (
                    f"window registration targets round {wr} but the"
                    f" ledger is at round {cur}: a full driver round"
                    " passed without a rotation; rotate and bump"
                    " operators.WINDOW_ROUND"
                )
            }
        ]
    names = list(ops.queries_map())
    window, tail = names[:50], names[50:]
    ages = green_ages(ledger_dir)

    def overdue(q: str) -> bool:
        a = ages.get(q)
        return a is not None and a > MAX_GREEN_AGE

    parked_overdue = sorted(
        (q for q in tail if overdue(q)), key=lambda q: -ages[q]
    )
    draining = [q for q in window if overdue(q)]
    quota = rotation_quota()
    required = min(quota, len(parked_overdue) + len(draining))
    if len(draining) < required:
        return [
            {
                "reason": (
                    f"window drains {len(draining)} overdue entries but"
                    f" the rotation quota is {required} (tail"
                    f" {len(tail)}, max age {MAX_GREEN_AGE}); rotate in"
                    " the oldest parked entries"
                ),
                "oldest_parked_overdue": [
                    {"query": q, "age": ages[q]}
                    for q in parked_overdue[: required - len(draining)]
                ],
            }
        ]
    return []


def age_table() -> list[dict]:
    """Per-query green-age report (oldest first) -- the ledger feed."""
    import dump1090_stream_parser_spark.operators as ops

    names = list(ops.queries_map())
    window = set(names[:50])
    ages = green_ages()
    return sorted(
        (
            {
                "query": q,
                "age": ages[q],
                "in_window": q in window,
            }
            for q in names
        ),
        key=lambda r: (r["age"] is not None, -(r["age"] or 0), r["query"]),
    )


def holder_liveness() -> list[dict]:
    """Report-only companion check: parked rationales whose cited
    holder CHAIN never reaches a currently-in-window query. Holder
    citations are transitive by construction -- a query parks by
    naming a holder, which may itself later park by naming ITS holder
    -- so liveness follows the chain (bounded by the tail size). Not a
    failure: rationales may legitimately lean on the parity gate or
    streaming pytest e2e alone; but a rotation that strands a whole
    capability tier shows up here first, so read this before choosing
    the next round's parks."""
    import dump1090_stream_parser_spark.operators as ops

    names = list(ops.queries_map())
    in_window = set(names[:50])
    cites = {
        q: set(re.findall(r"q_\w+", r)) - {q}
        for q, r in ops.EVAL_TAIL_RATIONALE.items()
    }

    def chain_live(q: str) -> bool:
        seen = set()
        frontier = set(cites.get(q, ()))
        while frontier:
            if frontier & in_window:
                return True
            seen |= frontier
            frontier = {
                n
                for f in frontier
                for n in cites.get(f, ())
                if n not in seen
            }
        return False

    return [
        {"query": q, "cited": sorted(c)}
        for q, c in cites.items()
        if c and not chain_live(q)
    ]


def main() -> None:
    violations = check_parked()
    age_violations = check_green_age()
    ages = green_ages()
    dist: dict[int | None, int] = {}
    for a in ages.values():
        dist[a] = dist.get(a, 0) + 1
    print(
        json.dumps(
            {
                "current_round": current_round(),
                "window_round": window_round(),
                "rotation_pending": rotation_pending(),
                "violations": violations,
                "green_age_violations": age_violations,
                "green_age_distribution": {
                    str(k): v
                    for k, v in sorted(
                        dist.items(),
                        key=lambda t: (t[0] is None, t[0] or 0),
                    )
                },
                "rotation_quota": rotation_quota(),
                "stranded_holder_chains": holder_liveness(),
            },
            indent=1,
        )
    )
    raise SystemExit(1 if (violations or age_violations) else 0)


if __name__ == "__main__":
    main()
