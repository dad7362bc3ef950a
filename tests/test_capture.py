"""Chapman capture-recapture: brute parity, recovery of a planted
closed population, under-sampling direction, support gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.capture import chapman_support

BASE = dt.datetime(2024, 3, 1)
US = 1_000_000


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )


def _brute(events):
    """events: (us, cents). Replays the operator exactly."""
    mn = {}
    mx = {}
    for u, c in events:
        mn[c] = min(mn.get(c, u), u)
        mx[c] = max(mx.get(c, u), u)
    lo = min(mn.values())
    hi = max(mx.values())
    mid = lo + (hi - lo) // 2
    n1 = sum(1 for c in mn if mn[c] < mid)
    n2 = sum(1 for c in mx if mx[c] >= mid)
    m = sum(1 for c in mn if mn[c] < mid and mx[c] >= mid)
    est = _r6((n1 + 1) * (n2 + 1) / (m + 1) - 1.0)
    var = _r6(
        (n1 + 1.0) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1.0) * (m + 1) * (m + 2))
    )
    return len(mn), n1, n2, m, est, var


def test_chapman_brute_parity(spark):
    rng = np.random.default_rng(2503)
    rows, evs = [], {}
    for k in range(3):
        events = []
        for i in range(150):
            u = int(rng.integers(0, 3600)) * US
            c = int(rng.integers(0, 60))
            events.append((u, c))
            rows.append(
                (f"k{k}", BASE + dt.timedelta(microseconds=u), c / 100.0)
            )
        evs[f"k{k}"] = events
    got = {r["key"]: r for r in chapman_support(_df(spark, rows)).collect()}
    for k, events in evs.items():
        n_obs, n1, n2, m, est, var = _brute(events)
        r = got[k]
        assert (r["n_obs"], r["n1"], r["n2"], r["m"]) == (n_obs, n1, n2, m)
        assert r["chapman_est"] == est
        assert r["chapman_var"] == var


def test_chapman_recovers_closed_population(spark):
    """A uniform closed population of 80 values sampled heavily in
    both halves: estimate lands near 80 with small variance."""
    rng = np.random.default_rng(2511)
    rows = []
    for i in range(2000):
        u = int(rng.integers(0, 7200)) * US
        c = int(rng.integers(0, 80))
        rows.append(("pop", BASE + dt.timedelta(microseconds=u), c / 100.0))
    r = chapman_support(_df(spark, rows)).collect()[0]
    assert 75 <= r["chapman_est"] <= 85
    assert r["chapman_est"] >= r["n_obs"] - 1  # never below observed-ish
    # light sampling of a big population: estimate far above observed
    rows2 = []
    for i in range(60):
        u = int(rng.integers(0, 7200)) * US
        c = int(rng.integers(0, 500))
        rows2.append(("thin", BASE + dt.timedelta(microseconds=u), c / 100.0))
    r2 = chapman_support(_df(spark, rows2)).collect()[0]
    assert r2["chapman_est"] > r2["n_obs"] * 1.5


def test_chapman_gate(spark):
    rows = [("t", BASE + dt.timedelta(seconds=i), float(i % 5)) for i in range(30)]
    assert chapman_support(_df(spark, rows)).collect() == []
