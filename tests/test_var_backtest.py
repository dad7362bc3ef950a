"""Kupiec POF: brute-force parity, planted miscalibration separation,
x=0 boundary, min_obs drop."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.var_backtest import kupiec_pof

BASE = dt.datetime(2024, 1, 1)


def _rows(key, cents):
    return [
        (key, BASE + dt.timedelta(minutes=i), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(cents, p=0.01):
    c = np.asarray(cents, dtype=np.int64)
    n = c.size
    n1 = n // 2
    est, test = c[:n1], c[n1:]
    ku = max((99 * n1) // 100, 1)
    u = int(np.sort(est)[ku - 1])
    x = int((test > u).sum())
    nt = test.size
    t_nx = (nt - x) * (math.log(1 - p) - math.log(1 - x / nt)) if x < nt else 0.0
    t_x = x * (math.log(p) - math.log(x / nt)) if x > 0 else 0.0
    return u, x, nt, -2.0 * (t_nx + t_x)


def test_brute_force_parity(spark):
    rng = np.random.default_rng(51)
    cents = rng.integers(100, 100000, size=200)
    out = kupiec_pof(_mk(spark, _rows("a", cents))).collect()
    assert len(out) == 1
    u, x, nt, lr = _brute(cents)
    r = out[0]
    assert (r["n_est"], r["n_test"], r["u_cents"], r["x_viol"]) == (
        100, nt, u, x,
    )
    assert abs(r["lr_pof"] - lr) < 1e-6


def test_planted_regime_break_fails_backtest(spark):
    rng = np.random.default_rng(53)
    calm = rng.integers(1000, 2000, size=100)
    stormy = rng.integers(1500, 9000, size=100)  # test half shifts up
    broken = np.concatenate([calm, stormy])
    stable = rng.integers(1000, 2000, size=200)
    out = {
        r["key"]: r
        for r in kupiec_pof(
            _mk(spark, _rows("broken", broken) + _rows("stable", stable))
        ).collect()
    }
    # the regime break blows the violation rate far past 1%
    assert out["broken"]["viol_rate"] > 0.3
    assert out["broken"]["lr_pof"] > 3.841  # chi2(1) 95%
    assert out["stable"]["lr_pof"] < out["broken"]["lr_pof"]


def test_zero_violations_boundary(spark):
    # test half strictly below the estimation threshold -> x = 0,
    # LR = -2 * n_test * ln(1-p) exactly (the x*ln(x) term vanishes)
    est = list(range(1000, 1100))  # cents 1000..1099
    test = [500] * 100
    out = kupiec_pof(_mk(spark, _rows("a", est + test))).collect()[0]
    assert out["x_viol"] == 0 and out["viol_rate"] == 0.0
    assert abs(out["lr_pof"] - (-2.0 * 100 * math.log(0.99))) < 1e-6


def test_min_obs_drop(spark):
    out = kupiec_pof(_mk(spark, _rows("short", range(100, 130))))
    assert out.count() == 0


def test_ulcer_brute_and_properties(spark):
    """Ulcer index: brute parity on a planted peak/valley profile plus
    the slow-bleed vs spike separation max_dd cannot make."""
    from tits_spark.operators.rolling import ulcer_index

    # spike: one sharp 50% drop, instant recovery; bleed: shallow 10%
    # under water the whole time — same max_dd ordering flips on ulcer
    spike = [1000] * 30 + [500] + [1000] * 30
    bleed = [1000] + [900] * 60
    df = _mk(spark, _rows("spike", spike) + _rows("bleed", bleed))
    out = {r["key"]: r for r in ulcer_index(df).collect()}

    def brute(cents):
        import numpy as np

        c = np.asarray(cents, dtype=np.int64)
        p = np.maximum.accumulate(c)
        d = (10_000 * (p - c)) // p
        return (
            int(d.max()),
            float(d.sum()) / d.size,
            math.sqrt(float((d * d).sum()) / d.size),
        )

    for k, cents in (("spike", spike), ("bleed", bleed)):
        mx, avg, ui = brute(cents)
        assert out[k]["max_dd_bp"] == mx
        assert abs(out[k]["avg_dd_bp"] - avg) < 1e-6
        assert abs(out[k]["ulcer_bp"] - ui) < 1e-6
    assert out["spike"]["max_dd_bp"] > out["bleed"]["max_dd_bp"]
    assert out["spike"]["ulcer_bp"] < out["bleed"]["ulcer_bp"]
