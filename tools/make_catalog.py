"""Generate docs/QUERIES.md from the live operator registry.

Usage: python tools/make_catalog.py > docs/QUERIES.md

Keeps the human-readable catalog honest: it is derived from the same
REGISTRY the driver harness sees, so it cannot drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dump1090_stream_parser_spark.operators import (  # noqa: E402
    EVAL_TAIL_RATIONALE,
    REGISTRY,
)


def main() -> None:
    full = {n: e for n, e in REGISTRY.items() if e.oracle}
    rows_only = {n: e for n, e in REGISTRY.items() if not e.oracle}
    n_window = len(REGISTRY) - len(EVAL_TAIL_RATIONALE)
    print("# Query catalog (generated -- do not edit)")
    print()
    print(f"{len(REGISTRY)} registered queries: {len(full)} with a full")
    print("DuckDB value oracle, "
          f"{len(rows_only)} rows-only (sketches/stubs with bounded-error")
    print("or unit tests instead). Regenerate with "
          "`python tools/make_catalog.py > docs/QUERIES.md`.")
    print()
    print(f"eval = `window`: one of the {n_window} queries the external")
    print("driver's per-round correctness gate evaluates (it reads the")
    print("first 50 registry entries); `tail`: past that window, with the")
    print("in-window query that proves the same capability listed in the")
    print("second table. EVERY query, windowed or not, is held to the")
    print("same DuckDB parity locally (tests/test_parity.py at sf0.001;")
    print("tools/parity.py sweeps sf0.01/0.1).")
    print()
    print("| query | oracle | eval | summary |")
    print("| --- | --- | --- | --- |")
    for name in sorted(REGISTRY):
        entry = REGISTRY[name]
        first_line = (entry.doc.splitlines() or [""])[0].strip()
        kind = "full" if entry.oracle else "rows-only"
        ev = "tail" if name in EVAL_TAIL_RATIONALE else "window"
        print(f"| `{name}` | {kind} | {ev} | {first_line} |")
    print()
    print("## Deferred-tail capability map")
    print()
    print("Why each tail query can sit outside the driver window -- the")
    print("capability it exercises is already proven by an in-window")
    print("query (source of truth: `operators/__init__.py`")
    print("`EVAL_TAIL_RATIONALE`, which also fixes the rotation order):")
    print()
    print("| tail query | capability held in-window by |")
    print("| --- | --- |")
    for name, why in EVAL_TAIL_RATIONALE.items():
        print(f"| `{name}` | {why} |")


if __name__ == "__main__":
    main()
