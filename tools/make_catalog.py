"""Generate docs/QUERIES.md from the live operator registry.

Usage: python tools/make_catalog.py > docs/QUERIES.md

Keeps the human-readable catalog honest: it is derived from the same
REGISTRY the driver harness sees, so it cannot drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dump1090_stream_parser_spark.operators import REGISTRY  # noqa: E402


def main() -> None:
    full = {n: e for n, e in REGISTRY.items() if e.oracle}
    rows_only = {n: e for n, e in REGISTRY.items() if not e.oracle}
    print("# Query catalog (generated -- do not edit)")
    print()
    print(f"{len(REGISTRY)} registered queries: {len(full)} with a full")
    print("DuckDB value oracle, "
          f"{len(rows_only)} rows-only (sketches/stubs with bounded-error")
    print("or unit tests instead). Regenerate with "
          "`python tools/make_catalog.py > docs/QUERIES.md`.")
    print()
    print("| query | oracle | summary |")
    print("| --- | --- | --- |")
    for name in sorted(REGISTRY):
        entry = REGISTRY[name]
        first_line = (entry.doc.splitlines() or [""])[0].strip()
        kind = "full" if entry.oracle else "rows-only"
        print(f"| `{name}` | {kind} | {first_line} |")


if __name__ == "__main__":
    main()
