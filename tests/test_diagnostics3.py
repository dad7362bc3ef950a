"""Round-5 diagnostics wave 3: ARCH-LM, DFA, underwater spells,
turning points, Cox-Stuart, Cornish-Fisher — brute-force parity on
planted series plus the qualitative separations each test exists for.
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
    """Deterministic pseudo-random int steps in [-50, 50] (seeded
    numpy MT — a plain LCG mod 101 is far too correlated for the
    randomness tests below to read as noise)."""
    return [
        int(v)
        for v in np.random.RandomState(seed).randint(-50, 51, n)
    ]


# ----------------------------------------------------------------- arch_lm

def _brute_archlm(cents):
    c = np.asarray(cents, dtype=np.int64)
    r = np.diff(c)
    z = r * r
    zt, zl = z[1:].astype(float), z[:-1].astype(float)
    m = zt.size
    vx = m * (zl * zl).sum() - zl.sum() ** 2
    vy = m * (zt * zt).sum() - zt.sum() ** 2
    cov = m * (zl * zt).sum() - zl.sum() * zt.sum()
    r2 = cov * cov / (vx * vy)
    return m, r2, m * r2


def test_arch_lm_brute_and_separation(spark):
    from tits_spark.operators.archlm import arch_lm

    # volatility-clustered: alternating calm/wild regimes make z_t
    # strongly autocorrelated; iid: constant-magnitude steps
    steps = _det(7, 400)
    wild = [s * (5 if (i // 50) % 2 else 1) for i, s in enumerate(steps)]
    clustered = list(np.cumsum([0] + wild))
    iid = list(np.cumsum([0] + _det(11, 400)))
    out = {
        r["key"]: r
        for r in arch_lm(
            _mk(spark, _rows("cl", clustered) + _rows("iid", iid))
        ).collect()
    }
    for k, cents in (("cl", clustered), ("iid", iid)):
        m, r2, lm = _brute_archlm(cents)
        assert out[k]["n_pairs"] == m
        assert abs(out[k]["r2"] - round(r2, 6)) < 1e-9
        assert abs(out[k]["lm"] - round(lm, 6)) < 1e-9
    assert out["cl"]["lm"] > 3.841  # rejects no-ARCH
    assert out["iid"]["lm"] < out["cl"]["lm"]


def test_arch_lm_min_pairs(spark):
    from tits_spark.operators.archlm import arch_lm

    assert arch_lm(_mk(spark, _rows("s", range(20)))).count() == 0


# --------------------------------------------------------------------- dfa

def _brute_dfa(cents):
    y = np.cumsum(np.asarray(cents, dtype=np.int64))
    res = {}
    for s in (4, 8, 16, 32):
        nb = y.size // s
        j = np.arange(1, s + 1, dtype=float)
        sse = 0.0
        for b in range(nb):
            yy = y[b * s:(b + 1) * s].astype(float)
            A = np.vstack([j, np.ones(s)]).T
            coef, *_ = np.linalg.lstsq(A, yy, rcond=None)
            sse += ((yy - A @ coef) ** 2).sum()
        res[s] = 0.5 * math.log2(sse / (nb * s))
    lf = res
    alpha = (
        -1.5 * lf[4] - 0.5 * lf[8] + 0.5 * lf[16] + 1.5 * lf[32]
    ) / 5.0
    return lf, alpha


def test_dfa_brute_and_regimes(spark):
    from tits_spark.operators.dfa import dfa_alpha

    # DFA treats the input as increments of the profile: iid input
    # reads alpha ~ 0.5 (white noise), a random-walk input reads
    # alpha ~ 1.5 (integrated noise)
    iid = _det(3, 512)
    walk = [int(v) for v in np.cumsum(_det(5, 512))]
    df = _mk(spark, _rows("walk", walk) + _rows("iid", iid))
    out = {r["key"]: r for r in dfa_alpha(df).collect()}
    for k, cents in (("walk", walk), ("iid", iid)):
        lf, alpha = _brute_dfa(cents)
        for s in (4, 8, 16, 32):
            assert abs(out[k][f"lf_{s}"] - round(lf[s], 6)) < 1e-5
        assert abs(out[k]["alpha"] - round(alpha, 6)) < 1e-5
        assert out[k]["n_obs"] == 512
    assert out["walk"]["alpha"] > 1.2
    assert abs(out["iid"]["alpha"] - 0.5) < 0.25


def test_dfa_short_key_dropped(spark):
    from tits_spark.operators.dfa import dfa_alpha

    assert dfa_alpha(_mk(spark, _rows("s", range(50)))).count() == 0


# -------------------------------------------------------------- underwater

def test_underwater_planted_spells(spark):
    from tits_spark.operators.rolling import underwater_spells

    # peak 100, dip of 3 ticks, recover, dip of 5 ticks, end open
    cents = (
        [100, 101, 102]          # rising, never below
        + [99, 98, 99]           # spell 1: 3 ticks below peak 102
        + [103]                  # recovery (new peak)
        + [50, 60, 70, 80, 90]   # spell 2: 5 ticks, open at end
    )
    out = underwater_spells(
        _mk(spark, _rows("k", cents)), min_obs=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_spells"] == 2
    assert r["below_ticks"] == 8
    assert r["max_spell_ticks"] == 5
    # spell 2 runs from the tick BEFORE it (idx 6) to the last tick
    # (idx 11): 5 minutes = 300 s
    assert r["max_spell_secs"] == 300
    assert r["n_obs"] == 12


def test_underwater_monotone_key_absent(spark):
    from tits_spark.operators.rolling import underwater_spells

    out = underwater_spells(
        _mk(spark, _rows("up", range(100, 140))), min_obs=5
    )
    assert out.count() == 0


# ---------------------------------------------------------- turning points

def test_turning_points_brute_and_extremes(spark):
    from tits_spark.operators.randomness import turning_points

    saw = [i % 2 for i in range(100)]  # every interior point turns
    trend = list(range(100))           # no turns
    # iid VALUES (not a walk: a walk turns with prob 1/2, not the
    # exchangeable 2/3, and this test correctly flags it)
    rnd = _det(13, 100)
    df = _mk(
        spark, _rows("saw", saw) + _rows("tr", trend) + _rows("rnd", rnd)
    )
    out = {r["key"]: r for r in turning_points(df).collect()}

    def brute(c):
        c = np.asarray(c)
        a, b, d = c[:-2], c[1:-1], c[2:]
        t = int((((a < b) & (b > d)) | ((a > b) & (b < d))).sum())
        n = c.size
        return t, (t - 2.0 * (n - 2.0) / 3.0) / math.sqrt(
            (16.0 * n - 29.0) / 90.0
        )

    for k, c in (("saw", saw), ("tr", trend), ("rnd", rnd)):
        t, z = brute(c)
        assert out[k]["n_turns"] == t
        assert abs(out[k]["z"] - round(z, 6)) < 1e-9
    assert out["saw"]["n_turns"] == 98 and out["saw"]["z"] > 3
    assert out["tr"]["n_turns"] == 0 and out["tr"]["z"] < -3
    assert abs(out["rnd"]["z"]) < 3


# -------------------------------------------------------------- cox_stuart

def test_cox_stuart_brute(spark):
    from tits_spark.operators.randomness import cox_stuart

    up = [i + (_det(17, 101)[i] // 10) for i in range(101)]  # odd n
    flat = _det(19, 100)
    df = _mk(spark, _rows("up", up) + _rows("fl", flat))
    out = {r["key"]: r for r in cox_stuart(df).collect()}

    def brute(c):
        n = len(c)
        h = n // 2
        first, second = c[:h], c[n - h:]
        diffs = [b - a for a, b in zip(first, second)]
        m = sum(1 for d in diffs if d != 0)
        npl = sum(1 for d in diffs if d > 0)
        z = (npl - m / 2.0) / math.sqrt(m / 4.0)
        return m, npl, z

    for k, c in (("up", up), ("fl", flat)):
        m, npl, z = brute(c)
        assert out[k]["n_pairs"] == m
        assert out[k]["n_plus"] == npl
        assert abs(out[k]["z"] - round(z, 6)) < 1e-9
    assert out["up"]["z"] > 3
    assert abs(out["fl"]["z"]) < 3


# --------------------------------------------------------- cornish_fisher

def test_cornish_fisher_brute_and_gaussian_limit(spark):
    from tits_spark.operators.tail import cornish_fisher

    # symmetric steps -> skew ~ 0, z_cf close to z for near-normal
    sym = list(np.cumsum([0] + _det(23, 500)))
    # heavy left tail: occasional big drops
    steps = _det(29, 500)
    heavy = list(
        np.cumsum([0] + [s - (400 if i % 97 == 0 else 0)
                         for i, s in enumerate(steps)])
    )
    df = _mk(spark, _rows("sym", sym) + _rows("hv", heavy))
    out = {r["key"]: r for r in cornish_fisher(df).collect()}

    z = -2.3263478740408408

    def brute(c):
        r = np.diff(np.asarray(c, dtype=np.int64)).astype(float)
        n = r.size
        mu = r.sum() / n
        m2 = (r * r).sum() / n - mu * mu
        m3 = (r ** 3).sum() / n - 3.0 * mu * (r * r).sum() / n \
            + 2.0 * mu ** 3
        m4 = (r ** 4).sum() / n - 4.0 * mu * (r ** 3).sum() / n \
            + 6.0 * mu * mu * (r * r).sum() / n - 3.0 * mu ** 4
        sig = math.sqrt(m2)
        s = m3 / sig ** 3
        k = m4 / (m2 * m2) - 3.0
        zcf = (
            z + (z * z - 1) * s / 6 + (z ** 3 - 3 * z) * k / 24
            - (2 * z ** 3 - 5 * z) * s * s / 36
        )
        return s, k, zcf, -(mu + sig * zcf)

    for key, c in (("sym", sym), ("hv", heavy)):
        s, k, zcf, mvar = brute(c)
        assert abs(out[key]["skew"] - round(s, 6)) < 1e-6
        assert abs(out[key]["kurt_x"] - round(k, 6)) < 1e-6
        assert abs(out[key]["z_cf"] - round(zcf, 6)) < 1e-6
        assert abs(out[key]["mvar_cents"] - round(mvar, 6)) < 1e-6
    # the heavy key's modified VaR must exceed both its own Gaussian
    # VaR and the symmetric key's mVaR
    hv = out["hv"]
    assert hv["skew"] < -1
    assert hv["mvar_cents"] > out["sym"]["mvar_cents"]


def test_cornish_fisher_constant_key_null(spark):
    from tits_spark.operators.tail import cornish_fisher

    out = cornish_fisher(_mk(spark, _rows("c", [5] * 50))).collect()
    assert len(out) == 1 and out[0]["z_cf"] is None
