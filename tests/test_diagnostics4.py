"""Round-5 diagnostics wave 4: Durbin-Watson / von Neumann, Bartels
rank von Neumann, Jarque-Bera, Grubbs ESD, AR(1) half-life —
brute-force parity on planted series plus the qualitative separation
each statistic exists for.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

BASE = dt.datetime(2024, 1, 1)


def _rows(key, cents):
    return [
        (key, BASE + dt.timedelta(minutes=i), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )


def _det(seed, n):
    return [
        int(v)
        for v in np.random.RandomState(seed).randint(-50, 51, n)
    ]


# ----------------------------------------------------- durbin_watson

def _brute_dw(cents):
    r = np.diff(np.asarray(cents, dtype=np.int64)).astype(float)
    n = r.size
    dw = (np.diff(r) ** 2).sum() / (r * r).sum()
    return n, dw, dw * n / (n - 1.0)


def test_durbin_watson_brute_and_separation(spark):
    from tits_spark.operators.vnratio import durbin_watson

    # positively autocorrelated returns (3-step smoothing) vs strictly
    # alternating returns (perfect negative autocorrelation, DW -> 4)
    steps = np.asarray(_det(13, 400), dtype=np.int64)
    smooth = np.convolve(steps, np.ones(3, dtype=np.int64))[: steps.size]
    pos = list(np.cumsum(np.concatenate([[0], smooth])))
    alt = list(np.cumsum([0] + [30 if i % 2 else -30 for i in range(400)]))
    out = {
        r["key"]: r
        for r in durbin_watson(
            _mk(spark, _rows("pos", pos) + _rows("alt", alt))
        ).collect()
    }
    for k, cents in (("pos", pos), ("alt", alt)):
        n, dw, vn = _brute_dw(cents)
        assert out[k]["n_ret"] == n
        assert abs(out[k]["dw"] - round(dw, 6)) < 1e-9
        assert abs(out[k]["vn"] - round(vn, 6)) < 1e-9
    assert out["pos"]["dw"] < 1.5  # positive serial correlation
    assert out["alt"]["dw"] > 3.5  # negative serial correlation


def test_durbin_watson_constant_key(spark):
    from tits_spark.operators.vnratio import durbin_watson

    row = durbin_watson(_mk(spark, _rows("c", [100] * 50))).first()
    assert row["dw"] is None and row["vn"] is None


# ------------------------------------------------------- bartels_rvn

def _brute_bartels(cents):
    c = np.asarray(cents, dtype=np.int64)
    # rank by (value, time) — row_number over the deterministic order
    order = np.lexsort((np.arange(c.size), c))
    rk = np.empty(c.size, dtype=np.int64)
    rk[order] = np.arange(1, c.size + 1)
    n = float(c.size)
    nm = float((np.diff(rk) ** 2).sum())
    rvn = nm / (n * (n * n - 1.0) / 12.0)
    var = (
        4.0 * (n - 2.0) * (5.0 * n * n - 2.0 * n - 9.0)
        / (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0))
    )
    return int(n), rvn, (rvn - 2.0) / math.sqrt(var)


def test_bartels_brute_and_separation(spark):
    from tits_spark.operators.vnratio import bartels_rank

    trend = list(range(0, 4000, 10))  # monotone: successive ranks adjacent
    iid = _det(17, 400)
    out = {
        r["key"]: r
        for r in bartels_rank(
            _mk(spark, _rows("tr", trend) + _rows("iid", iid))
        ).collect()
    }
    for k, cents in (("tr", trend), ("iid", iid)):
        n, rvn, z = _brute_bartels(cents)
        assert out[k]["n_obs"] == n
        assert abs(out[k]["rvn"] - round(rvn, 6)) < 1e-9
        assert abs(out[k]["z"] - round(z, 6)) < 1e-9
    assert out["tr"]["z"] < -10  # trend: far too few rank reversals
    assert abs(out["iid"]["z"]) < 3


# ------------------------------------------------------- jarque_bera

def _brute_jb(cents):
    r = np.diff(np.asarray(cents, dtype=np.int64)).astype(float)
    n = r.size
    mu = r.mean()
    m2 = ((r - mu) ** 2).mean()
    skew = ((r - mu) ** 3).mean() / m2 ** 1.5
    kurt = ((r - mu) ** 4).mean() / m2 ** 2 - 3.0
    return n, skew, kurt, n * (skew * skew / 6.0 + kurt * kurt / 24.0)


def test_jarque_bera_brute_and_separation(spark):
    from tits_spark.operators.normality import jarque_bera

    # near-uniform steps (platykurtic but mild) vs rare huge jumps
    # (leptokurtic — JB explodes)
    mild = list(np.cumsum([0] + _det(19, 400)))
    steps = _det(23, 400)
    for i in range(0, 400, 57):
        steps[i] *= 40
    heavy = list(np.cumsum([0] + steps))
    out = {
        r["key"]: r
        for r in jarque_bera(
            _mk(spark, _rows("mild", mild) + _rows("heavy", heavy))
        ).collect()
    }
    for k, cents in (("mild", mild), ("heavy", heavy)):
        n, skew, kurt, jb = _brute_jb(cents)
        assert out[k]["n_ret"] == n
        assert abs(out[k]["skew"] - round(skew, 6)) < 1e-6
        assert abs(out[k]["kurt_x"] - round(kurt, 6)) < 1e-6
        assert abs(out[k]["jb"] - round(jb, 6)) < 1e-4
    assert out["heavy"]["jb"] > 100.0
    assert out["heavy"]["jb"] > out["mild"]["jb"]


# ------------------------------------------------------------ grubbs

def test_grubbs_brute_and_sides(spark):
    from tits_spark.operators.normality import grubbs

    base = _det(29, 100)
    hi = list(base)
    hi[40] = 5000  # single high outlier
    lo = list(base)
    lo[60] = -5000  # single low outlier
    out = {
        r["key"]: r
        for r in grubbs(
            _mk(spark, _rows("hi", hi) + _rows("lo", lo))
        ).collect()
    }
    for k, cents in (("hi", hi), ("lo", lo)):
        c = np.asarray(cents, dtype=np.int64).astype(float)
        mu, s = c.mean(), c.std(ddof=1)
        g = max(c.max() - mu, mu - c.min()) / s
        assert out[k]["n_obs"] == len(cents)
        assert abs(out[k]["g"] - round(g, 6)) < 1e-9
    assert out["hi"]["side"] == "high" and out["lo"]["side"] == "low"
    assert out["hi"]["g"] > 5.0


def test_grubbs_constant_key(spark):
    from tits_spark.operators.normality import grubbs

    row = grubbs(_mk(spark, _rows("c", [100] * 50))).first()
    assert row["g"] is None


# --------------------------------------------------------- half_life

def _brute_ar1(cents):
    c = np.asarray(cents, dtype=np.int64).astype(float)
    x, y = c[:-1], c[1:]
    m = x.size
    vx = m * (x * x).sum() - x.sum() ** 2
    vy = m * (y * y).sum() - y.sum() ** 2
    cov = m * (x * y).sum() - x.sum() * y.sum()
    phi = cov / vx
    r2 = cov * cov / (vx * vy)
    hl = -math.log(2.0) / math.log(phi) if 0.0 < phi < 1.0 else None
    return m, phi, r2, hl


def test_half_life_brute_and_reversion(spark):
    from tits_spark.operators.meanrev import ar1_half_life

    # planted AR(1) with phi = 0.8 around level 0 (half-life ~ 3.1
    # ticks) vs a pure random walk (phi ~ 1, no half-life)
    rng = np.random.RandomState(31)
    ar = [0]
    for _ in range(799):
        ar.append(int(round(0.8 * ar[-1] + rng.randint(-50, 51))))
    walk = list(np.cumsum(rng.randint(-50, 51, 800)))
    out = {
        r["key"]: r
        for r in ar1_half_life(
            _mk(spark, _rows("ar", ar) + _rows("walk", walk))
        ).collect()
    }
    for k, cents in (("ar", ar), ("walk", walk)):
        m, phi, r2, hl = _brute_ar1(cents)
        assert out[k]["n_pairs"] == m
        assert abs(out[k]["phi"] - round(phi, 6)) < 1e-9
        assert abs(out[k]["r2"] - round(r2, 6)) < 1e-9
        if hl is None:
            assert out[k]["half_life"] is None
        else:
            assert abs(out[k]["half_life"] - round(hl, 6)) < 1e-6
    assert 2.0 < out["ar"]["half_life"] < 5.0
    assert out["walk"]["phi"] > 0.97


def test_half_life_walk_no_reversion(spark):
    from tits_spark.operators.meanrev import ar1_half_life

    # strictly increasing: phi fit > 1 on a trending ramp -> NULL hl
    ramp = [i * i // 10 for i in range(100)]
    row = ar1_half_life(_mk(spark, _rows("r", ramp))).first()
    assert row["half_life"] is None or row["half_life"] > 50
