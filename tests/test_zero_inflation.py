"""Zero-inflation score test: brute parity, planted on/off key vs
Poisson key ordering, no-silent-days behavior, span gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.poissonness import zero_inflation_daily

BASE = dt.datetime(2024, 3, 1)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _rows(key, day_counts):
    rows = []
    for d, c in enumerate(day_counts):
        for j in range(int(c)):
            rows.append((key, BASE + dt.timedelta(days=d, minutes=j)))
    return rows


def _brute(day_counts):
    n = len(day_counts)
    n0 = sum(1 for c in day_counts if c == 0)
    tot = sum(day_counts)
    yb = tot / n
    p0 = math.exp(-yb)
    num = (n0 - n * p0) * (n0 - n * p0)
    den = n * p0 * (1.0 - p0) - n * yb * (p0 * p0)
    s = _r6(num / den) if den > 0 else None
    return n, n0, tot, _r6(yb), s


def test_zi_brute_parity(spark):
    rng = np.random.default_rng(2903)
    rows, keys = [], {}
    for k in range(3):
        counts = rng.poisson(1.2, 25).tolist()
        counts[0] = max(counts[0], 1)   # span anchors
        counts[-1] = max(counts[-1], 1)
        keys[f"k{k}"] = counts
        rows += _rows(f"k{k}", counts)
    got = {
        r["key"]: r for r in zero_inflation_daily(_df(spark, rows)).collect()
    }
    for k, counts in keys.items():
        n, n0, tot, yb, s = _brute(counts)
        r = got[k]
        assert (r["n_days"], r["n_zero_days"], r["total"]) == (n, n0, tot)
        assert r["ybar"] == yb
        assert r["zi_score"] == s


def test_zi_flags_on_off_pattern(spark):
    """An on/off key (half the days silent, busy otherwise) must
    score far above a plain Poisson key of the same mean."""
    rng = np.random.default_rng(2909)
    onoff = []
    for d in range(40):
        onoff.append(0 if d % 2 else int(rng.poisson(6)) + 1)
    onoff[0] = max(onoff[0], 1)
    onoff[-1] = onoff[-1] if onoff[-1] else 1
    pois = [int(x) for x in rng.poisson(float(np.mean(onoff)), 40)]
    pois[0] = max(pois[0], 1)
    pois[-1] = max(pois[-1], 1)
    rows = _rows("onoff", onoff) + _rows("pois", pois)
    got = {
        r["key"]: r for r in zero_inflation_daily(_df(spark, rows)).collect()
    }
    assert got["onoff"]["zi_score"] > 20
    assert got["pois"]["zi_score"] < 6


def test_zi_gate(spark):
    rows = _rows("short", [2] * 5)
    assert zero_inflation_daily(_df(spark, rows)).collect() == []
