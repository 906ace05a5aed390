"""The KMV bottom-k sketch algebra q_source_overlap_kmv's (and
q_set_overlap_kmv's) at-scale story rests on, pinned as hypothesis
properties over the actual trim semantics:

merge(S_A, S_B) := bottomk(S_A ∪ S_B) must equal bottomk(A ∪ B) --
i.e. sketches of shards merge to the sketch of the whole, in any
order, any grouping, with duplicates free. That is what lets a
production run sketch each partition/day/source independently and
answer overlap questions later without touching the corpus again.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dump1090_stream_parser_spark.operators.dedup import SOV_K

hashes = st.sets(
    st.integers(min_value=0, max_value=(1 << 60) - 1), max_size=300
)


def bottomk(s: set[int], k: int = SOV_K) -> list[int]:
    return sorted(s)[:k]


@settings(max_examples=200, deadline=None)
@given(a=hashes, b=hashes)
def test_kmv_merge_equals_sketch_of_union(a, b):
    merged = bottomk(set(bottomk(a)) | set(bottomk(b)))
    assert merged == bottomk(a | b)


@settings(max_examples=100, deadline=None)
@given(a=hashes, b=hashes, c=hashes)
def test_kmv_merge_is_associative_and_commutative(a, b, c):
    def m(x, y):
        return set(bottomk(set(x) | set(y)))

    sa, sb, sc = set(bottomk(a)), set(bottomk(b)), set(bottomk(c))
    assert m(m(sa, sb), sc) == m(sa, m(sb, sc))
    assert m(sa, sb) == m(sb, sa)


@settings(max_examples=100, deadline=None)
@given(a=hashes)
def test_kmv_is_duplicate_insensitive(a):
    # re-observing keys cannot change a min-sketch: the property that
    # lets the at-scale plan skip the corpus-sized DISTINCT entirely
    # (the sovsweep sketch arm builds bottom-k off the RAW gram stream)
    assert bottomk(a | a) == bottomk(a)
    sk = set(bottomk(a))
    assert bottomk(sk | set(bottomk(a))) == bottomk(a)


@settings(max_examples=200, deadline=None)
@given(a=hashes)
def test_kmv_estimator_exact_below_k(a):
    # the registered estimator's CASE arm: a sketch that holds the
    # whole set reports the exact distinct count
    sk = bottomk(a)
    if len(a) < SOV_K:
        assert len(sk) == len(a)
