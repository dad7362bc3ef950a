"""Reliability grid: textbook-formula parity (numpy variances / ANOVA
mean squares on the zero-filled grid vs the cleared integer lattices),
planted stable vs noisy profiles, degenerate gates."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.reliability import cronbach_icc

BASE = dt.datetime(2024, 3, 1)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _rows(key, grid):
    """grid: (n_days, 24) int array of event counts."""
    rows = []
    for d in range(grid.shape[0]):
        for h in range(24):
            for i in range(int(grid[d, h])):
                rows.append(
                    (
                        key,
                        BASE
                        + dt.timedelta(days=d, hours=h, minutes=i % 59),
                    )
                )
    return rows


def _brute(grid):
    """Textbook alpha/ICC on the zero-filled grid (population-free:
    sample variances with n-1), matching the module's cleared forms."""
    n, k = grid.shape
    g = grid.astype(float)
    item_var = g.var(axis=0, ddof=1)  # per-hour across days
    total_var = g.sum(axis=1).var(ddof=1)
    alpha = None
    if total_var > 0:
        alpha = _r6(k / (k - 1) * (1 - item_var.sum() / total_var))
    grand = g.mean()
    ssb = k * ((g.mean(axis=1) - grand) ** 2).sum()
    ssw = ((g - g.mean(axis=1, keepdims=True)) ** 2).sum()
    msb = ssb / (n - 1)
    msw = ssw / (n * (k - 1))
    den = msb + (k - 1) * msw
    icc = _r6((msb - msw) / den) if den > 0 else None
    return alpha, icc


def test_reliability_textbook_parity(spark):
    rng = np.random.default_rng(1511)
    rows, grids = [], {}
    for i, kname in enumerate(["stable", "noisy", "mixed"]):
        n_days = 10 + i * 3
        if kname == "stable":
            base = rng.integers(0, 6, 24)
            grid = np.maximum(
                0, base + rng.integers(-1, 2, (n_days, 24))
            )
        elif kname == "noisy":
            grid = rng.integers(0, 6, (n_days, 24))
        else:
            grid = np.zeros((n_days, 24), dtype=int)
            grid[:, :6] = rng.integers(0, 4, (n_days, 6))
        grids[kname] = grid
        rows += _rows(kname, grid)
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["key"]: r for r in cronbach_icc(df).collect()}
    for kname, grid in grids.items():
        alpha, icc = _brute(grid)
        r = got[kname]
        assert r["n_days"] == grid.shape[0]
        assert r["g_total"] == int(grid.sum())
        assert r["sq_sum"] == int((grid.astype(np.int64) ** 2).sum())
        assert r["day_ss"] == int(
            (grid.sum(axis=1).astype(np.int64) ** 2).sum()
        )
        assert r["hour_ss"] == int(
            (grid.sum(axis=0).astype(np.int64) ** 2).sum()
        )
        if alpha is None:
            assert r["alpha"] is None
        else:
            assert abs(r["alpha"] - alpha) <= 1e-6
        if icc is None:
            assert r["icc1"] is None
        else:
            assert abs(r["icc1"] - icc) <= 1e-6


def test_reliability_planted_ordering(spark):
    """Consistent hour covariation (busy days busy in EVERY hour) must
    score higher reliability than i.i.d. noise: items=hours agreeing
    on which subjects=days are large is exactly what alpha/ICC(1)
    measure."""
    rng = np.random.default_rng(1523)
    shape = np.array([4, 3, 2, 1, 1, 0] * 4)
    level = rng.integers(1, 6, 14)  # busy vs quiet days
    stable = np.maximum(
        0, level[:, None] * shape[None, :] + rng.integers(-1, 2, (14, 24))
    )
    noise = rng.integers(0, 8, (14, 24))
    rows = _rows("stable", stable) + _rows("noise", noise)
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["key"]: r for r in cronbach_icc(df).collect()}
    assert got["stable"]["icc1"] > got["noise"]["icc1"]
    assert got["stable"]["alpha"] > got["noise"]["alpha"]


def test_reliability_span_counts_empty_days(spark):
    """Days with zero events sit inside the span and lower n-moments
    only through n_days: span 9 although only 2 days have events."""
    grid = np.zeros((9, 24), dtype=int)
    grid[0, 3] = 5
    grid[8, 3] = 5
    df = spark.createDataFrame(
        _rows("k", grid), "user_id string, ts timestamp"
    )
    r = cronbach_icc(df).collect()[0]
    assert r["n_days"] == 9 and r["g_total"] == 10
    alpha, icc = _brute(grid)
    assert abs(r["icc1"] - icc) <= 1e-6


def test_reliability_min_days_gate(spark):
    grid = np.ones((3, 24), dtype=int)
    df = spark.createDataFrame(
        _rows("k", grid), "user_id string, ts timestamp"
    )
    assert cronbach_icc(df).collect() == []
