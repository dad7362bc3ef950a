from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.kalman import kalman_local_level


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


BASE = dt.datetime(2024, 1, 1)


def test_kalman_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    rows = []
    for key in ("a", "b"):
        t = 0.0
        for _ in range(40):
            t += float(rng.integers(1, 3600))
            rows.append((key, BASE + dt.timedelta(seconds=t), float(rng.normal(50, 10))))
    out = (
        kalman_local_level(_mk(spark, rows), q=1.0, r=100.0)
        .orderBy("key", "ts")
        .collect()
    )
    # independent reference recursion
    by_key = {}
    for key, ts, v in rows:
        by_key.setdefault(key, []).append((ts, v))
    exp = {}
    for key, obs in by_key.items():
        obs.sort()
        a, p = obs[0][1], 100.0
        exp[(key, obs[0][0])] = (a, 1.0, p)
        for (t0, _), (t1, y) in zip(obs, obs[1:]):
            gap = (t1 - t0).total_seconds()
            pp = p + 1.0 * gap
            k = pp / (pp + 100.0)
            a = a + k * (y - a)
            p = (1 - k) * pp
            exp[(key, t1)] = (a, k, p)
    assert len(out) == len(rows)
    for r in out:
        e = exp[(r.key, r.ts)]
        assert r.level == pytest.approx(e[0], abs=1e-12)
        assert r.gain == pytest.approx(e[1], abs=1e-12)
        assert r.p_var == pytest.approx(e[2], abs=1e-12)


def test_kalman_gain_grows_with_gap(spark):
    # identical values, one short gap then one huge gap: the gain after
    # the long silence must dominate the gain after the burst
    rows = [
        ("k", BASE, 10.0),
        ("k", BASE + dt.timedelta(seconds=1), 12.0),
        ("k", BASE + dt.timedelta(days=30), 99.0),
    ]
    out = {r.ts: r for r in kalman_local_level(_mk(spark, rows)).collect()}
    g_short = out[rows[1][1]].gain
    g_long = out[rows[2][1]].gain
    assert g_short < 0.6
    assert g_long > 0.99
    # after the long gap the level has moved nearly all the way to 99
    assert abs(out[rows[2][1]].level - 99.0) < 1.0


def test_kalman_variance_bounded_by_r(spark):
    # steady-state posterior variance never exceeds r (K*r identity)
    rows = [
        ("k", BASE + dt.timedelta(seconds=i * 60), float(i % 7)) for i in range(50)
    ]
    out = kalman_local_level(_mk(spark, rows), q=1.0, r=100.0).collect()
    assert all(r.p_var <= 100.0 + 1e-9 for r in out)
    assert all(0.0 < r.gain <= 1.0 for r in out)
