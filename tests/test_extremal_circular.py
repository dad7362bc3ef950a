"""Extremal index (Ferro-Segers) and Rayleigh circular uniformity:
brute-force parity, planted clustering / planted phase, degeneracy."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.circular import rayleigh_uniformity
from tits_spark.operators.extremal import extremal_index

BASE = dt.datetime(2024, 1, 1)


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )


def _brute_theta(times_s, k_used):
    gaps = np.diff(np.sort(np.asarray(times_s, dtype=np.int64)))
    st, st2 = int(gaps.sum()), int((gaps * gaps).sum())
    if st2 == 0:
        return None
    return min(1.0, 2.0 * float(st) * float(st) / ((k_used - 1) * float(st2)))


def test_extremal_clustered_vs_scattered(spark):
    rng = np.random.default_rng(3)
    rows = []
    # "scatter": top values spread evenly -> theta ~ 1
    scatter_times = [i * 7200 for i in range(30)]
    # "burst": top values arrive in 6 tight clusters of 5 -> theta ~ 1/5
    burst_times = []
    for c in range(6):
        t0 = c * 36000
        burst_times += [t0 + j for j in range(5)]
    for key, times in (("scatter", scatter_times), ("burst", burst_times)):
        for t in times:
            rows.append((key, _t(t), 1000.0 + rng.uniform(0, 1)))
        # background below every exceedance
        for i in range(100):
            rows.append((key, _t(i * 997 + 13), float(rng.uniform(0, 10))))
    out = {r["key"]: r for r in extremal_index(_mk(spark, rows), k=30).collect()}
    assert out["scatter"]["n_exc"] == 30 and out["burst"]["n_exc"] == 30
    assert out["scatter"]["theta"] > 0.9
    assert out["burst"]["theta"] < 0.45
    # exact moment parity vs brute force on the known exceedance times
    for key, times in (("scatter", scatter_times), ("burst", burst_times)):
        want = _brute_theta(times, 30)
        assert abs(out[key]["theta"] - want) < 1e-6
        gaps = np.diff(np.sort(np.asarray(times, dtype=np.int64)))
        assert out[key]["sum_t"] == int(gaps.sum())
        assert out[key]["sum_t2"] == int((gaps * gaps).sum())


def test_extremal_threshold_is_order_statistic(spark):
    # 40 rows valued 1..40: top-30 threshold = value 11 -> 1100 cents
    rows = [("k", _t(i * 60), float(i + 1)) for i in range(40)]
    r = extremal_index(_mk(spark, rows), k=30).collect()[0]
    assert r["u_cents"] == 1100
    # gaps all 60s among the top-30 (they are consecutive in time)
    assert r["sum_t"] == 29 * 60 and r["sum_t2"] == 29 * 3600


def test_extremal_small_key_drops_and_zero_gaps(spark):
    rows = [("small", _t(i), float(i)) for i in range(10)]
    # all 30 exceedances at the SAME microsecond -> every gap 0 -> NULL
    rows += [("zero", _t(0), 100.0 + i * 0.01) for i in range(30)]
    out = {r["key"]: r for r in extremal_index(_mk(spark, rows), k=30).collect()}
    assert "small" not in out
    assert out["zero"]["theta"] is None and out["zero"]["sum_t2"] == 0


def test_rayleigh_phase_vs_uniform(spark):
    rng = np.random.default_rng(11)
    rows = []
    # "cron": all events within the same 10-minute daily window
    for d in range(20):
        for j in range(3):
            rows.append(("cron", _t(d * 86400 + 3 * 3600 + j * 120), 0.0))
    # "service": uniform around the clock
    for i in range(600):
        rows.append(("service", _t(float(rng.uniform(0, 86400 * 20))), 0.0))
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {r["key"]: r for r in rayleigh_uniformity(df).collect()}
    assert out["cron"]["rbar"] > 0.99
    assert out["service"]["rbar"] < 0.15
    assert out["cron"]["z"] > 50
    # brute-force parity on the cron key
    angles = [
        2 * math.pi * ((d * 86400 + 3 * 3600 + j * 120) % 86400) / 86400
        for d in range(20)
        for j in range(3)
    ]
    cs, ss = sum(map(math.cos, angles)), sum(map(math.sin, angles))
    n = len(angles)
    assert abs(out["cron"]["c_bar"] - cs / n) < 1e-5
    assert abs(out["cron"]["s_bar"] - ss / n) < 1e-5
    assert abs(out["cron"]["z"] - (cs * cs + ss * ss) / n) < 1e-4


def test_rayleigh_min_points(spark):
    rows = [("k", _t(i * 3600), 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    assert rayleigh_uniformity(df, min_points=8).count() == 0
