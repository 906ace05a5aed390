"""EMA recurrence: parity fold vs the segmented affine-composition
scale path (operators/timeseries.py)."""

from __future__ import annotations

import math

from dump1090_stream_parser_spark.operators.timeseries import (
    EMA_ALPHA,
    ema_segmented,
    q_ema,
)

from .conftest import SF_DIR


def _reference_ema(values: list[float]) -> float:
    acc = values[0]
    for x in values[1:]:
        acc = acc * (1 - EMA_ALPHA) + EMA_ALPHA * x
    return acc


def test_ema_matches_python_recurrence(spark):
    """The sorted-array fold IS the textbook recurrence: recompute one
    user's EMA with a plain Python loop over the same ordering."""
    from dump1090_stream_parser_spark.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    rows = (
        events.filter("value IS NOT NULL AND user_id = 1")
        .select("ts", "event_id", "value")
        .collect()
    )
    assert rows, "fixture user 1 must have events"
    ordered = [
        float(r["value"])
        for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"]))
    ]
    expect = round(_reference_ema(ordered), 6)
    got = {
        r["user_id"]: r["ema_value"]
        for r in q_ema(spark, SF_DIR).collect()
    }
    assert math.isclose(got[1], expect, rel_tol=0, abs_tol=5e-7)


def test_ema_dispatch_picks_single_fold_below_threshold(spark):
    """q_ema is density-dispatched (VERDICT r8 ask #2): at every test
    SF the max per-user series is far below the measured crossover
    threshold, so the registered query must execute the single fold --
    the plan whose fold the oracle hash-certifies bit-for-bit."""
    from dump1090_stream_parser_spark.operators.timeseries import (
        EMA_SEGMENT_MAX_TASK_ROWS,
        ema_single_fold,
    )
    from dump1090_stream_parser_spark.tables import load_table

    longest = (
        load_table(spark, SF_DIR, "events")
        .filter("value IS NOT NULL")
        .groupBy("user_id")
        .count()
        .agg({"count": "max"})
        .first()[0]
    )
    assert longest <= EMA_SEGMENT_MAX_TASK_ROWS
    got = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in q_ema(spark, SF_DIR).collect()
    }
    single = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in ema_single_fold(spark, SF_DIR).collect()
    }
    assert got == single


def test_ema_segmented_matches_single_fold(spark):
    """The affine-composition two-level fold equals the parity fold to
    float-reassociation tolerance, for every key, at two segment
    widths (many small segments and one containing-everything segment,
    which must reduce to the single fold exactly)."""
    single = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in q_ema(spark, SF_DIR).collect()
    }
    for width in ("30 minutes", "3650 days"):
        seg = {
            r["user_id"]: (r["n_events"], r["ema_value"])
            for r in ema_segmented(spark, SF_DIR, width).collect()
        }
        assert seg.keys() == single.keys()
        for uid, (n, v) in single.items():
            ns, vs = seg[uid]
            assert ns == n
            # the certified value is round(·, 6); the unrounded
            # segmented value must sit within that rounding grain
            assert math.isclose(vs, v, rel_tol=0, abs_tol=5.01e-7), (
                uid,
                width,
                vs,
                v,
            )


def test_interval_peak_matches_python(spark):
    from collections import defaultdict
    from datetime import timedelta

    from dump1090_stream_parser_spark.operators.timeseries import (
        q_interval_peak,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = {
        r["month"].date(): (r["peak_open"], r["boundary_days"])
        for r in q_interval_peak(spark, SF_DIR).collect()
    }
    assert got, "monthly peaks expected"

    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in load_table(spark, SF_DIR, "orders").collect()
    }
    last_ship: dict[int, object] = {}
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        d = r["l_shipdate"].date()
        k = r["l_orderkey"]
        if k not in last_ship or d > last_ship[k]:
            last_ship[k] = d
    deltas: dict[object, int] = defaultdict(int)
    for k, d1 in last_ship.items():
        deltas[orders[k]] += 1
        deltas[d1 + timedelta(days=1)] -= 1
    running = 0
    peaks: dict[object, int] = {}
    days: dict[object, int] = defaultdict(int)
    for d in sorted(deltas):
        running += deltas[d]
        m = d.replace(day=1)
        days[m] += 1
        if m not in peaks or running > peaks[m]:
            peaks[m] = running
    assert running == 0, "sweep must close all intervals"
    assert got == {m: (peaks[m], days[m]) for m in peaks}


def test_decay_topk_matches_python(spark):
    import math
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.timeseries import (
        DECAY_TOP_K,
        DECAY_WEEKS_MAX,
        q_decay_topk,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = [
        (r["user_id"], r["n_events"], r["decayed_score"])
        for r in q_decay_topk(spark, SF_DIR).collect()
    ]
    assert 0 < len(got) <= DECAY_TOP_K

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "value")
        .collect()
    )
    ref = max(r["ts"] for r in rows)
    scaled: dict[int, int] = defaultdict(int)
    n: dict[int, int] = defaultdict(int)
    for r in rows:
        vq = math.floor(r["value"] * 1e6 + 0.5)
        # calendar-date difference (Spark datediff == DuckDB
        # date_diff('day')), NOT elapsed-time floor
        wk = min(
            DECAY_WEEKS_MAX, (ref.date() - r["ts"].date()).days // 7
        )
        scaled[r["user_id"]] += vq * (1 << (DECAY_WEEKS_MAX - wk))
        n[r["user_id"]] += 1
    ranked = sorted(scaled.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [
        (uid, n[uid],
         round(sc / ((1 << DECAY_WEEKS_MAX) * 1e6), 6))
        for uid, sc in ranked[:DECAY_TOP_K]
    ]
    # compare keys + counts exactly; scores to the round(6) grain
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert math.isclose(g[2], e[2], rel_tol=0, abs_tol=1.01e-6)

    # decay monotonicity: a 1-week-later event weight is >= the older
    # weight at every clamp level
    weights = [1 << (DECAY_WEEKS_MAX - min(DECAY_WEEKS_MAX, k))
               for k in range(15)]
    assert all(a >= b for a, b in zip(weights, weights[1:]))


def test_cusum_matches_python(spark):
    import math
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.timeseries import q_cusum
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = {
        r["event_type"]: (r["n_events"], r["cusum"], r["change_pos"])
        for r in q_cusum(spark, SF_DIR).collect()
    }
    assert got, "per-type cusum rows expected"

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 1e6 + 0.5))
        )
    assert series.keys() == got.keys()
    for etype, pts in series.items():
        pts.sort()
        xs = [p[2] for p in pts]
        n, t = len(xs), sum(xs)
        # drawdown_i = s_i - min(s_1..s_i): the running min is over
        # the s series itself (UNBOUNDED PRECEDING..CURRENT ROW), so
        # drawdown_1 == 0 by construction
        run = 0
        smin = None
        stat, pos = -1, None
        for i, x in enumerate(xs, start=1):
            run += n * x - t
            smin = run if smin is None else min(smin, run)
            dd = run - smin
            if dd > stat:
                stat, pos = dd, i
        g = got[etype]
        assert g[0] == n
        assert math.isclose(
            g[1], stat / (n * 1e6), rel_tol=1e-9, abs_tol=1.01e-6
        )
        assert g[2] == pos
        assert g[1] >= 0 and 1 <= g[2] <= n


def test_cusum_segmented_equals_single_sort(spark):
    """The registered q_cusum IS the segmented plan (VERDICT r8 ask
    #2); its five-integer segment summaries must reproduce the single
    sort EXACTLY -- including the first-attained change position --
    at several widths (many small segments, segment == whole series,
    and a width leaving sparse/empty buckets)."""
    from dump1090_stream_parser_spark.operators.timeseries import (
        cusum_segmented,
        cusum_single_sort,
        q_cusum,
    )
    from .conftest import SF_DIR

    single = {
        r["event_type"]: (r["n_events"], r["cusum"], r["change_pos"])
        for r in cusum_single_sort(spark, SF_DIR).collect()
    }
    registered = {
        r["event_type"]: (r["n_events"], r["cusum"], r["change_pos"])
        for r in q_cusum(spark, SF_DIR).collect()
    }
    assert registered == single
    for width in ("12 hours", "30 days", "3650 days"):
        seg = {
            r["event_type"]: (r["n_events"], r["cusum"], r["change_pos"])
            for r in cusum_segmented(spark, SF_DIR, width).collect()
        }
        assert seg == single, width


def test_holt_matches_python(spark):
    import math

    from dump1090_stream_parser_spark.operators.timeseries import q_holt
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"],
                       r["forecast_h3"])
        for r in q_holt(spark, SF_DIR).collect()
    }
    assert got, "per-user holt rows expected"

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in rows:
        series[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    assert series.keys() == got.keys()
    for uid, pts in series.items():
        pts.sort()
        xs = [p[2] for p in pts]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            # SIMULTANEOUS update in the expanded linear form -- the
            # exact op sequence both engines fold
            l2 = 0.25 * x + 0.75 * l + 0.75 * b
            b2 = 0.0625 * x - 0.0625 * l + 0.9375 * b
            l, b = l2, b2
        g = got[uid]
        assert g[0] == len(xs)
        assert math.isclose(g[1], l, rel_tol=0, abs_tol=5.01e-7)
        assert math.isclose(g[2], b, rel_tol=0, abs_tol=5.01e-7)
        assert math.isclose(
            g[3], l + 3.0 * b, rel_tol=0, abs_tol=1.51e-6
        )


def test_holt_tracks_linear_ramp():
    # trend-tracking property: on x_t = 5t the trend converges near 5
    l, b = 5.0, 0.0
    for t in range(2, 200):
        x = 5.0 * t
        l2 = 0.25 * x + 0.75 * l + 0.75 * b
        b2 = 0.0625 * x - 0.0625 * l + 0.9375 * b
        l, b = l2, b2
    assert abs(b - 5.0) < 0.5
    assert abs(l - 5.0 * 199) < 25.0


def test_holt_segmented_matches_single_fold(spark):
    """The 2x2 affine-matrix composition equals the flat-list parity
    fold to float-reassociation tolerance at several widths (including
    one-containing-everything, which must reduce to the single fold),
    and the registered q_holt dispatches to the single fold below the
    measured crossover."""
    import math

    from dump1090_stream_parser_spark.operators.timeseries import (
        holt_segmented,
        holt_single_fold,
        q_holt,
    )
    from .conftest import SF_DIR

    single = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"])
        for r in holt_single_fold(spark, SF_DIR).collect()
    }
    registered = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"])
        for r in q_holt(spark, SF_DIR).collect()
    }
    assert registered == single  # sub-threshold dispatch
    for width in ("30 minutes", "3650 days"):
        seg = {
            r["user_id"]: (r["n_events"], r["level"], r["trend"])
            for r in holt_segmented(spark, SF_DIR, width).collect()
        }
        assert seg.keys() == single.keys()
        for uid, (n, lv, tr) in single.items():
            ns, lvs, trs = seg[uid]
            assert ns == n
            assert math.isclose(lvs, lv, rel_tol=0, abs_tol=5.01e-7), (
                uid, width,
            )
            assert math.isclose(trs, tr, rel_tol=0, abs_tol=5.01e-7), (
                uid, width,
            )


def test_burst_matches_python(spark):
    """q_burst third-engine check: zero-filled day spine + trailing
    7-day z-scores recomputed in pure Python."""
    import math
    from collections import defaultdict
    from datetime import timedelta

    from dump1090_stream_parser_spark.operators.timeseries import (
        BURST_WINDOW,
        BURST_Z,
        q_burst,
    )
    from dump1090_stream_parser_spark.tables import load_table
    from .conftest import SF_DIR

    got = {
        (r["event_type"], r["day"]): r
        for r in q_burst(spark, SF_DIR).collect()
    }
    assert got, "burst rows expected"
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "ts")
        .collect()
    )
    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["event_type"]][r["ts"].date()] += 1
    expect = {}
    for etype, days in daily.items():
        lo, hi = min(days), max(days)
        spine = []
        d = lo
        while d <= hi:
            spine.append((d, days.get(d, 0)))
            d += timedelta(days=1)
        for i in range(BURST_WINDOW, len(spine)):
            day, c = spine[i]
            trail = [c2 for _, c2 in spine[i - BURST_WINDOW:i]]
            s, ss = sum(trail), sum(x * x for x in trail)
            var = (7 * ss - s * s) / 49.0
            z = (c - s / 7.0) / math.sqrt(var) if var > 0 else None
            expect[(etype, day)] = (c, s / 7.0, z)
    assert {(t, d.date()) for t, d in got.keys()} == expect.keys()
    for (etype, day), r in got.items():
        c, mean, z = expect[(etype, day.date())]
        assert r["n_events"] == c
        assert math.isclose(
            r["base_mean"], mean, rel_tol=0, abs_tol=5.01e-7
        )
        if z is None:
            assert r["z"] is None and r["is_burst"] is False
        else:
            assert math.isclose(r["z"], z, rel_tol=1e-9, abs_tol=5.01e-7)
            assert r["is_burst"] == (z > BURST_Z)


def test_sax_matches_python_and_is_scale_invariant(spark):
    """Third-engine SAX recompute, the word-contract pin (lowercase
    a-d, length SAX_SEGMENTS), and the property SAX exists for: an
    affine-rescaled copy of a series (same shape, different scale and
    offset) yields the SAME word."""
    import math
    from collections import defaultdict

    from dump1090_stream_parser_spark.operators.timeseries import (
        SAX_BREAKS,
        SAX_SEG_DAYS,
        SAX_SEGMENTS,
        q_sax,
    )
    from dump1090_stream_parser_spark.tables import load_table

    from .conftest import SF_DIR

    got = {r["event_type"]: r for r in q_sax(spark, SF_DIR).collect()}
    assert got
    rows = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "CAST(datediff(to_date(ts), to_date('2024-01-01')) AS LONG)"
            " AS x",
        )
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["event_type"]][r["x"]] += 1
    breaks = [float(b) for b in SAX_BREAKS]

    def sax_word(series):  # {x: y} -> word
        nd = len(series)
        sx = sum(series.values())
        sxx = sum(y * y for y in series.values())
        mean = sx / nd
        std = math.sqrt(nd * sxx - sx * sx) / nd
        segs = defaultdict(lambda: [0, 0])
        for x, y in series.items():
            s = segs[x // SAX_SEG_DAYS]
            s[0] += y
            s[1] += 1
        word = ""
        for seg in sorted(segs):
            sy, cnt = segs[seg]
            paa = (sy / cnt - mean) / std
            word += chr(97 + sum(1 for b in breaks if paa > b))
        return word

    for et, r in got.items():
        series = daily[et]
        assert r["word"] == sax_word(series)
        assert len(r["word"]) == SAX_SEGMENTS
        assert all("a" <= c <= "d" for c in r["word"])
        # shape invariance: y -> 7y + 300 preserves the word
        scaled = {x: 7 * y + 300 for x, y in series.items()}
        assert sax_word(scaled) == r["word"]
