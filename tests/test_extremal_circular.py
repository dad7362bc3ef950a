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


def _brute_kuiper(times_s):
    DAY = 86_400_000_000
    u = np.sort((np.asarray(times_s, dtype=np.int64) * 1_000_000
                 + int(BASE.timestamp()) * 1_000_000) % DAY)
    n = len(u)
    i = np.arange(1, n + 1, dtype=np.int64)
    dp = int(np.max(i * DAY - n * u))
    dm = int(np.max(n * u - (i - 1) * DAY))
    v = (dp + dm) / (n * DAY)
    vn = v * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    return dp, dm, v, vn


def test_kuiper_brute_force_parity(spark):
    from tits_spark.operators.circular import kuiper_uniformity

    rng = np.random.default_rng(11)
    rows = []
    per_key = {}
    for k in range(4):
        times = sorted(rng.integers(0, 20 * 86400, size=60).tolist())
        per_key[f"k{k}"] = times
        rows += [(f"k{k}", _t(s), 0.0) for s in times]
    got = {
        r["key"]: r
        for r in kuiper_uniformity(_mk(spark, rows)).collect()
    }
    assert set(got) == set(per_key)
    for k, times in per_key.items():
        dp, dm, v, vn = _brute_kuiper(times)
        assert got[k]["dp_num"] == dp and got[k]["dm_num"] == dm
        assert got[k]["v"] == round(v, 6)
        assert got[k]["vn_stat"] == round(vn, 6)


def test_kuiper_bimodal_beats_rayleigh_blind_spot(spark):
    """Two tight opposite phases (06:00 and 18:00): the Rayleigh
    resultant cancels to ~0 (looks uniform) while Kuiper rejects."""
    from tits_spark.operators.circular import kuiper_uniformity

    rows = []
    for d in range(30):
        rows.append(("bi", _t(d * 86400 + 6 * 3600), 0.0))
        rows.append(("bi", _t(d * 86400 + 18 * 3600), 0.0))
    for j in range(60):  # uniform control at a 24-coprime stride
        rows.append(("uni", _t(j * 86400 // 60 + j * 1441), 0.0))
    df = _mk(spark, rows)
    ray = {r["key"]: r["rbar"] for r in rayleigh_uniformity(df).collect()}
    kui = {
        r["key"]: r["vn_stat"]
        for r in kuiper_uniformity(df).collect()
    }
    assert ray["bi"] < 0.05  # Rayleigh is blind to the antipodal pair
    assert kui["bi"] > 2.0   # Kuiper rejects loudly (1% cv ~ 2.0)
    assert kui["uni"] < 1.75  # uniform control stays below the 5% cv


def test_kuiper_rotation_invariance(spark):
    """Shifting every event by the same clock offset leaves V
    unchanged (the property KS-on-the-wrapped-value lacks)."""
    from tits_spark.operators.circular import kuiper_uniformity

    rng = np.random.default_rng(7)
    times = sorted(int(x) for x in rng.integers(0, 86400, size=40))
    rows = [("a", _t(s), 0.0) for s in times]
    shift = 7 * 3600 + 123
    rows += [("b", _t((s + shift) % 86400), 0.0) for s in times]
    out = {
        r["key"]: r["v"]
        for r in kuiper_uniformity(_mk(spark, rows)).collect()
    }
    assert abs(out["a"] - out["b"]) <= 2e-6  # round-6 quanta apart

def test_kuiper_min_points(spark):
    from tits_spark.operators.circular import kuiper_uniformity

    rows = [("tiny", _t(i * 3600), 0.0) for i in range(5)]
    assert kuiper_uniformity(_mk(spark, rows)).count() == 0
