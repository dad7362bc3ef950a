"""Risk ratios: brute-force parity, planted monotone-up (no downside)
and crash-path extremes, multiple-obs-per-day close rule."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.risk_ratios import risk_ratios

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(closes):
    rs = [b - a for a, b in zip(closes, closes[1:])]
    sum_r = sum(rs)
    down2 = sum(r * r for r in rs if r < 0)
    gain = sum(r for r in rs if r > 0)
    loss = sum(-r for r in rs if r < 0)
    peak, maxdd = closes[0], 0
    for c in closes:
        peak = max(peak, c)
        maxdd = max(maxdd, peak - c)
    n = len(closes)
    sortino = (
        round(sum_r / math.sqrt((n - 1) * down2), 6) + 0.0 if down2 else None
    )
    omega = round(gain / loss, 6) + 0.0 if loss else None
    calmar = round(sum_r / maxdd, 6) + 0.0 if maxdd else None
    return n, sum_r, down2, gain, loss, maxdd, sortino, omega, calmar


def test_risk_ratios_brute_force_parity(spark):
    rng = np.random.default_rng(107)
    rows, per_key = [], {}
    for k in range(3):
        vals = [float(v) for v in np.round(rng.normal(80, 6, 30), 2)]
        per_key[f"k{k}"] = [round(v * 100) for v in vals]
        rows += [
            (f"k{k}", BASE + dt.timedelta(days=i, hours=12), v)
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in risk_ratios(_ev(spark, rows)).collect()}
    for k, closes in per_key.items():
        n, sum_r, down2, gain, loss, maxdd, so, om, ca = _brute(closes)
        r = got[k]
        assert (
            r["n_days"], r["sum_r"], r["down2"], r["gain"], r["loss"],
            r["maxdd"],
        ) == (n, sum_r, down2, gain, loss, maxdd), k
        assert r["sortino"] == so
        assert r["omega"] == om
        assert r["calmar"] == ca


def test_risk_ratios_monotone_up_poles(spark):
    """Strictly rising closes: no downside, no loss, no drawdown ->
    all three ratios NULL at their poles, integers still exact."""
    rows = [
        ("up", BASE + dt.timedelta(days=i), 10.0 + i) for i in range(12)
    ]
    r = risk_ratios(_ev(spark, rows)).collect()[0]
    assert r["sum_r"] == 1100  # 11 daily +100-cent steps
    assert (r["down2"], r["loss"], r["maxdd"]) == (0, 0, 0)
    assert r["sortino"] is None and r["omega"] is None and r["calmar"] is None


def test_risk_ratios_close_rule_and_gaps(spark):
    """The day's close is the LAST observation (max us); unobserved
    days contribute no return row (gap-skipping)."""
    rows = [
        ("g", BASE + dt.timedelta(hours=9), 100.0),
        ("g", BASE + dt.timedelta(hours=15), 110.0),   # day0 close 110
        # day1 unobserved
        ("g", BASE + dt.timedelta(days=2, hours=3), 90.0),   # day2 close…
        ("g", BASE + dt.timedelta(days=2, hours=20), 95.0),  # …95
    ] + [
        ("g", BASE + dt.timedelta(days=3 + i), 95.0 + i) for i in range(8)
    ]
    r = risk_ratios(_ev(spark, rows), min_days=3).collect()[0]
    assert r["n_days"] == 10
    # returns: 9500-11000 = -1500, then 0, +100 x7
    assert r["loss"] == 1500
    assert r["gain"] == 700
    assert r["maxdd"] == 1500
    assert r["calmar"] == round((700 - 1500) / 1500, 6) + 0.0
