"""Seasonal Mann-Kendall: brute-force parity, planted trend, pure
weekly cycle degeneracy, trend-under-cycle detection."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.seasonal_mk import seasonal_mann_kendall

BASE = dt.datetime(2024, 1, 1)
DAY = 86400.0


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _t(day, sec=1.0):
    return BASE + dt.timedelta(days=int(day), seconds=float(sec))


def _brute(days, vals, n_seasons=7):
    """O(n^2) Hirsch-Slack reference over (day, cents) points."""
    c = [int(round(v * 100)) for v in vals]
    base_day = (BASE - dt.datetime(1970, 1, 1)).days
    seasons = {}
    for d, v in zip(days, c):
        seasons.setdefault((base_day + d) % n_seasons, []).append((d, v))
    s_stat = var18 = n_obs = 0
    for pts in seasons.values():
        pts.sort()
        n = len(pts)
        n_obs += n
        for i in range(n):
            for j in range(i + 1, n):
                s_stat += (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
        _, counts = np.unique([v for _, v in pts], return_counts=True)
        t = counts.astype(np.int64)
        var18 += n * (n - 1) * (2 * n + 5) - int(
            (t * (t - 1) * (2 * t + 5)).sum()
        )
    z = None
    if var18 > 0:
        sd = np.sqrt(var18 / 18.0)
        if s_stat > 0:
            z = round((s_stat - 1) / sd, 6) + 0.0
        elif s_stat < 0:
            z = round((s_stat + 1) / sd, 6) + 0.0
        else:
            z = 0.0
    return {"n_obs": n_obs, "s_stat": s_stat, "var18": var18, "z": z}


def test_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    rows, per_key = [], {}
    for k in ("a", "b"):
        days = list(range(35))
        vals = rng.integers(95, 106, len(days)).astype(float).tolist()
        per_key[k] = (days, vals)
        rows += [(k, _t(d), v) for d, v in zip(days, vals)]
    out = {r["key"]: r for r in seasonal_mann_kendall(_mk(spark, rows)).collect()}
    for k, (days, vals) in per_key.items():
        want = _brute(days, vals)
        got = out[k]
        for col in ("n_obs", "s_stat", "var18"):
            assert got[col] == want[col], (k, col, got[col], want[col])
        assert got["z"] == want["z"] or abs(got["z"] - want["z"]) < 2e-6


def test_planted_trend_is_strongly_positive(spark):
    rows = [("k", _t(d), 100.0 + d) for d in range(56)]
    out = seasonal_mann_kendall(_mk(spark, rows)).collect()[0]
    # strictly increasing within every season: S = sum of all pairs
    assert out["s_stat"] == 7 * (8 * 7 // 2)
    assert out["z"] > 3.0


def test_pure_weekly_cycle_degenerates(spark):
    # value depends ONLY on the weekday: every season is constant, so
    # the seasonal test sees zero evidence — var18 == 0, z NULL (the
    # non-seasonal test would see spurious pair structure instead)
    rows = [("k", _t(d), 100.0 + (d % 7)) for d in range(42)]
    out = seasonal_mann_kendall(_mk(spark, rows)).collect()[0]
    assert out["s_stat"] == 0 and out["var18"] == 0
    assert out["z"] is None


def test_trend_under_cycle_detected(spark):
    # weekly cycle 30x the daily drift: the seasonal test still sees a
    # clean monotone rise inside every season
    rows = [("k", _t(d), 100.0 + 30.0 * (d % 7) + 0.5 * d) for d in range(70)]
    out = seasonal_mann_kendall(_mk(spark, rows)).collect()[0]
    assert out["s_stat"] == 7 * (10 * 9 // 2)
    assert out["z"] > 3.0


def test_last_in_bucket_and_min_points(spark):
    # two ticks the same day: the LATER one wins the daily bucket
    rows = [("k", _t(d), 100.0 + d) for d in range(12)]
    rows.append(("k", _t(3, sec=2.0), 500.0))  # overrides day 3, above all
    rows.append(("k", _t(3, sec=0.5), 999.0))  # earlier, ignored
    rows += [("short", _t(d), float(d)) for d in range(5)]  # < min_points
    out = {r["key"]: r for r in
           seasonal_mann_kendall(_mk(spark, rows)).collect()}
    assert set(out) == {"k"}
    assert out["k"]["n_obs"] == 12
    # day 3's value 50 breaks the otherwise perfect rise
    perfect = sum(
        n * (n - 1) // 2 for n in (2, 2, 2, 2, 2, 1, 1)
    )
    assert out["k"]["s_stat"] < perfect
