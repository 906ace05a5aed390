"""Shared sketch cores for the Arrow-batch operators.

One implementation of the batched Misra-Gries step serves both the
batch operator (``operators.pipeline_ops.heavy_hitters_summary``) and
the streaming state update (``streaming.heavy_hitters``), so the two
modes cannot drift -- and the core is a pure pandas function, which
lets hypothesis hammer the guarantees without a Spark session
(tests/test_batch_fns.py).
"""

from __future__ import annotations

import pandas as pd


def mg_merge(
    summary: pd.Series | None, vc: pd.Series, cap: int
) -> tuple[pd.Series, int]:
    """One batched Misra-Gries step: merge batch counts ``vc`` into
    ``summary`` and, if more than ``cap`` keys survive, subtract the
    (cap+1)-th largest count from every counter and drop the
    non-positive ones (at most ``cap`` remain, all strictly greater
    than the subtracted amount).

    Returns (new summary, decrement added by THIS step). Maintaining
    ``dec`` as the running sum of returned decrements gives the
    classic guarantees for the partition/stream seen so far:
    ``est <= true <= est + dec`` for every key, and every key with
    ``true > dec`` is present in the summary."""
    if summary is None or summary.empty:
        summary = vc
    elif not vc.empty:
        summary = summary.add(vc, fill_value=0)
    if len(summary) > cap:
        summary = summary.sort_values(ascending=False)
        d = int(summary.iloc[cap])
        summary = summary - d
        return summary[summary > 0], d
    return summary, 0
