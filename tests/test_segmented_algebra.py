"""Property tests for the round-9 segmented-plan algebra: the claims
that let acf_segmented and cusum_segmented REGISTER as q_acf/q_cusum
with unchanged oracles are mathematical identities -- pin them with
hypothesis over adversarial inputs, not just the fixture corpus.

Pure-Python models on both sides (no Spark in the loop): each test
mirrors the exact integer algebra the Spark plan executes, so a
counterexample here would be a real plan bug, found in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# CUSUM: the drawdown decomposition max(p_t - m_t, off + p_t - gb)
# combined from five-integer segment summaries must equal the direct
# scan, including the FIRST-attained position.
# ---------------------------------------------------------------------------


def _cusum_direct(xs: list[int]) -> tuple[int, int]:
    """(max drawdown, first 1-based position) by the definition."""
    n, t = len(xs), sum(xs)
    run = 0
    smin = None
    stat, pos = -1, None
    for i, x in enumerate(xs, start=1):
        run += n * x - t
        smin = run if smin is None else min(smin, run)
        dd = run - smin
        if dd > stat:
            stat, pos = dd, i
    return stat, pos


def _cusum_segmented(xs: list[int], cut_mask: list[bool]) -> tuple[int, int]:
    """The cusum_segmented combine over arbitrary segmentation:
    cut_mask[i] True starts a new segment at element i (element 0
    always starts one)."""
    n, t = len(xs), sum(xs)
    ds = [n * x - t for x in xs]
    # per-segment five-integer summaries (+ argmax positions)
    segs = []
    i = 0
    while i < len(ds):
        j = i + 1
        while j < len(ds) and not cut_mask[j]:
            j += 1
        p = m = None
        P = 0
        k = 0
        A = None
        a_pos = None
        G = None
        g_pos = None
        M = None
        for local, d in enumerate(ds[i:j], start=1):
            P += d
            p = P
            m = p if m is None else min(m, p)
            M = m if M is None else min(M, m)
            a = p - m
            if A is None or a > A:
                A, a_pos = a, local
            if G is None or p > G:
                G, g_pos = p, local
        segs.append(
            {"k": j - i, "P": P, "M": M, "A": A, "a_pos": a_pos,
             "G": G, "g_pos": g_pos}
        )
        i = j
    # cross-segment combine (the summary-table windows)
    off = 0
    cnt_off = 0
    gb = None
    best = None
    best_pos = None
    scored = []
    for s in segs:
        branches = [(s["A"], cnt_off + s["a_pos"])]
        if gb is not None:
            branches.append((off + s["G"] - gb, cnt_off + s["g_pos"]))
        dmax = max(b for b, _ in branches)
        pos = min(p for b, p in branches if b == dmax)
        scored.append((dmax, pos))
        gb = off + s["M"] if gb is None else min(gb, off + s["M"])
        off += s["P"]
        cnt_off += s["k"]
    stat = max(d for d, _ in scored)
    first = min(p for d, p in scored if d == stat)
    return stat, first


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    st.data(),
)
def test_cusum_segment_combine_equals_direct(xs, data):
    cuts = data.draw(
        st.lists(st.booleans(), min_size=len(xs), max_size=len(xs))
    )
    cuts[0] = True
    assert _cusum_segmented(xs, cuts) == _cusum_direct(xs)


# ---------------------------------------------------------------------------
# ACF prefix carry: windowing (carry = global last LAG_MAX rows before
# the segment) + segment rows reproduces EXACTLY the global lag-k pair
# set, for any segmentation -- sparse or empty segments included.
# ---------------------------------------------------------------------------

LAG_MAX = 3


def _global_pairs(ys: list[int]) -> set:
    out = set()
    for k in (1, 2, 3):
        for i in range(k, len(ys)):
            out.add((k, i, ys[i - k], ys[i]))
    return out


def _carry_pairs(ys: list[int], cut_mask: list[bool]) -> set:
    segments: list[list[int]] = []  # global indices per segment
    for i in range(len(ys)):
        if i == 0 or cut_mask[i]:
            segments.append([])
        segments[-1].append(i)
    out = set()
    for si, seg in enumerate(segments):
        prefix = [i for s in segments[:si] for i in s]
        carry = prefix[-LAG_MAX:]
        window = carry + seg
        carry_set = set(carry)
        for k in (1, 2, 3):
            for wpos in range(k, len(window)):
                tgt = window[wpos]
                if tgt in carry_set:
                    continue  # carry rows emit no pairs of their own
                src = window[wpos - k]
                out.add((k, tgt, ys[src], ys[tgt]))
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    st.data(),
)
def test_acf_prefix_carry_reproduces_global_pairs(ys, data):
    cuts = data.draw(
        st.lists(st.booleans(), min_size=len(ys), max_size=len(ys))
    )
    cuts[0] = True
    assert _carry_pairs(ys, cuts) == _global_pairs(ys)


# ---------------------------------------------------------------------------
# Holt seed fixed point: A [x, 0] + k x == [x, 0] for every x -- the
# identity that lets holt_segmented fold every observation uniformly.
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e9, 1e9, allow_nan=False))
def test_holt_seed_is_fixed_point(x):
    l1 = 0.25 * x + 0.75 * x + 0.75 * 0.0
    b1 = 0.0625 * x - 0.0625 * x + 0.9375 * 0.0
    assert l1 == x and b1 == 0.0
