"""Weekend rate test: brute parity (exposure closed form vs direct
day enumeration), planted weekend-heavy key, equal-rate null, gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.ratecomp import weekend_rate_test

BASE = dt.datetime(2024, 3, 1)  # epoch day 19783, a Friday
US = 1_000_000


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
    base_day = 19783
    obs = [(base_day + i, c) for i, c in enumerate(day_counts) if c > 0]
    lo, hi = obs[0][0], obs[-1][0]
    wk = lambda d: (d + 4) % 7 in (0, 6)
    t1 = sum(1 for d in range(lo, hi + 1) if wk(d))
    t2 = (hi - lo + 1) - t1
    c1 = sum(c for d, c in obs if wk(d))
    c2 = sum(c for d, c in obs if not wk(d))
    n = c1 + c2
    p = t1 / (t1 + t2)
    var = n * p * (1.0 - p)
    z = _r6((c1 - n * p) / math.sqrt(var)) if t1 and t2 and var > 0 else None
    rr = (
        _r6((c1 / t1) / (c2 / t2)) if t1 and t2 and c2 > 0 else None
    )
    return hi - lo + 1, t1, c1, c2, z, rr


def test_rate_brute_parity(spark):
    rng = np.random.default_rng(3203)
    rows, keys = [], {}
    for k in range(3):
        counts = rng.poisson(3, 30).tolist()
        counts[0] = max(counts[0], 1)
        counts[-1] = max(counts[-1], 1)
        keys[f"k{k}"] = counts
        rows += _rows(f"k{k}", counts)
    got = {r["key"]: r for r in weekend_rate_test(_df(spark, rows)).collect()}
    for k, counts in keys.items():
        n_days, t1, c1, c2, z, rr = _brute(counts)
        r = got[k]
        assert (
            r["n_days"], r["t_weekend"], r["c_weekend"], r["c_weekday"],
        ) == (n_days, t1, c1, c2)
        assert r["rate_z"] == z and r["rate_ratio"] == rr


def test_rate_detects_weekend_surge(spark):
    # 2024-03-01 is Friday; weekend days are idx 1,2, 8,9, ...
    counts = []
    for d in range(28):
        dow = (19783 + d + 4) % 7
        counts.append(30 if dow in (0, 6) else 5)
    r = weekend_rate_test(_df(spark, _rows("surge", counts))).collect()[0]
    assert r["rate_z"] > 10
    assert 5.5 < r["rate_ratio"] < 6.5
    # equal-rate control stays modest
    flat = [10] * 28
    rf = weekend_rate_test(_df(spark, _rows("flat", flat))).collect()[0]
    assert abs(rf["rate_z"]) < 2.0


def test_rate_gate(spark):
    assert (
        weekend_rate_test(_df(spark, _rows("short", [3] * 5))).collect()
        == []
    )
