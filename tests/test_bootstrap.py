"""Circular block bootstrap: numpy replay parity (hash, wrap segments,
order-statistic bounds), parallelism invariance, degenerate full-wrap,
and the dependence-widens-the-CI property."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.bootstrap import J_MAX, KNUTH, M31, M32, block_bootstrap_mean

BASE = dt.datetime(2024, 1, 1)


def _t(sec):
    return BASE + dt.timedelta(seconds=int(sec))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key long, ts timestamp, value double")


def _replay(key, cents, B=100, L=25, k_lo=3, k_hi=98):
    """Independent numpy replay of the whole construction."""
    c = np.asarray(cents, dtype=np.int64)
    n = c.size
    pref = np.concatenate(([0], np.cumsum(c)))
    nj = (n + L - 1) // L
    sums = []
    for r in range(B):
        tot = 0
        for j in range(nj):
            s = ((((key * 131071 + r * J_MAX + j) % M31) * KNUTH) % M32) % n
            lj = L if j < nj - 1 else n - (nj - 1) * L
            hi = min(s + lj, n)
            tot += pref[hi] - pref[s]
            if s + lj > n:
                tot += pref[s + lj - n]
        sums.append(tot)
    sums.sort()
    return int(pref[n]), int(sums[k_lo - 1]), int(sums[k_hi - 1])


def test_numpy_replay_parity(spark):
    rng = np.random.default_rng(17)
    rows, expect = [], {}
    for key, n in ((3, 40), (9, 67), (21, 26)):
        vals = np.round(rng.normal(20, 5, n), 2)
        # time order defines the series order: strictly increasing ts
        rows += [(key, _t(i * 60), float(v)) for i, v in enumerate(vals)]
        expect[key] = _replay(key, np.round(vals * 100).astype(np.int64))
    out = {
        r["key"]: r for r in block_bootstrap_mean(_mk(spark, rows)).collect()
    }
    for key, (sum_c, lo, hi) in expect.items():
        r = out[key]
        assert r["sum_c"] == sum_c
        assert r["lo_sum"] == lo and r["hi_sum"] == hi
        assert r["lo_sum"] <= r["hi_sum"]
        assert abs(r["mean"] - sum_c / (r["n_obs"] * 100.0)) < 1e-6


def test_parallelism_invariance(spark):
    rng = np.random.default_rng(23)
    rows = [
        (int(k), _t(i * 30), float(np.round(rng.uniform(0, 50), 2)))
        for k in (1, 2)
        for i in range(50)
    ]
    df = _mk(spark, rows)
    a = sorted(
        tuple(r) for r in block_bootstrap_mean(df.repartition(1)).collect()
    )
    b = sorted(
        tuple(r) for r in block_bootstrap_mean(df.repartition(13)).collect()
    )
    assert a == b


def test_full_wrap_degenerate(spark):
    # n=10 < L=25: one block of length n -> every replicate is the full
    # circle -> all replicate sums equal the total -> lo == hi == sum_c
    rows = [(5, _t(i), float(i)) for i in range(10)]
    r = block_bootstrap_mean(_mk(spark, rows)).collect()[0]
    assert r["lo_sum"] == r["hi_sum"] == r["sum_c"]
    assert r["ci_lo"] == r["ci_hi"] == r["mean"]


def test_dependence_widens_ci(spark):
    rng = np.random.default_rng(31)
    n = 400
    # iid noise vs a slow random walk (strong positive autocorrelation)
    iid = np.round(rng.normal(100, 10, n), 2)
    walk = np.round(100 + np.cumsum(rng.normal(0, 1.0, n)), 2)
    rows = [(1, _t(i * 60), float(v)) for i, v in enumerate(iid)]
    rows += [(2, _t(i * 60), float(v)) for i, v in enumerate(walk)]
    out = {
        r["key"]: r for r in block_bootstrap_mean(_mk(spark, rows)).collect()
    }
    w_iid = out[1]["ci_hi"] - out[1]["ci_lo"]
    w_walk = out[2]["ci_hi"] - out[2]["ci_lo"]
    # the walk's blocks carry level dependence -> much wider interval
    assert w_walk > 2 * w_iid > 0
