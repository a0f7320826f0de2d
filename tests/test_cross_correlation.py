"""Lagged cross-correlation between event-type daily series:
brute-python cross-check with the same exact-integer-moment →
single-double-expression contract, plus zero-fill semantics."""

from __future__ import annotations

import math
from collections import Counter

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.behavior import (
    XCORR_MAX_LAG,
    ts_cross_correlation,
)


def _series(spark, sf_dir):
    """{type: [daily count over the zero-filled global span]}"""
    rows = load_table(spark, sf_dir, "events").collect()
    days = [r.ts.date() for r in rows]
    d0, d1 = min(days), max(days)
    span = (d1 - d0).days + 1
    out = {}
    for r in rows:
        t = r.event_type
        if t not in out:
            out[t] = [0] * span
        out[t][(r.ts.date() - d0).days] += 1
    return out


def _xcorr(xs, ys, lag):
    """Exact integer moments, then the one double expression."""
    px = xs[: len(xs) - lag] if lag else xs
    py = ys[lag:]
    n = len(px)
    sx, sy = sum(px), sum(py)
    sxy = sum(a * b for a, b in zip(px, py))
    sxx = sum(a * a for a in px)
    syy = sum(b * b for b in py)
    den = math.sqrt(
        (n * float(sxx) - float(sx) * float(sx))
        * (n * float(syy) - float(sy) * float(sy))
    )
    if not den > 0:
        return n, None
    return n, round((n * float(sxy) - float(sx) * float(sy)) / den, 6)


def test_xcorr_matches_brute(spark, sf_dir):
    series = _series(spark, sf_dir)
    got = {
        (r.type_a, r.type_b, r.lag): (r.n_days, r.xcorr)
        for r in ts_cross_correlation(spark, sf_dir).collect()
    }
    want = {}
    for ta, xs in series.items():
        for tb, ys in series.items():
            if ta == tb:
                continue
            for lag in range(XCORR_MAX_LAG + 1):
                want[(ta, tb, lag)] = _xcorr(xs, ys, lag)
    assert got == want
    # full ordered-pair × lag grid, nothing dropped
    k = len(series)
    assert len(got) == k * (k - 1) * (XCORR_MAX_LAG + 1)


def test_lag_zero_is_symmetric(spark, sf_dir):
    rows = ts_cross_correlation(spark, sf_dir).collect()
    at0 = {
        (r.type_a, r.type_b): r.xcorr for r in rows if r.lag == 0
    }
    for (a, b), v in at0.items():
        assert at0[(b, a)] == v
