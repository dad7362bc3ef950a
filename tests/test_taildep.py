"""Tail dependence: brute-force parity over the filled grid, planted
comonotone vs anti-monotone tails, constant-side NULL, min_obs drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.taildep import tail_dependence

BASE = dt.datetime(2024, 1, 1)


def _rows(key, side, cents_by_hour):
    return [
        (key, side, BASE + dt.timedelta(hours=int(h)), float(c) / 100.0)
        for h, c in cents_by_hour
    ]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, series string, ts timestamp, value double"
    )


def _brute(x, y):
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = x.size
    ku = (9 * n) // 10
    kd = n - ku + 1
    xu = np.sort(x)[ku - 1]
    yu = np.sort(y)[ku - 1]
    xl = np.sort(x)[kd - 1]
    yl = np.sort(y)[kd - 1]
    n_xu = int((x > xu).sum())
    ju = int(((x > xu) & (y > yu)).sum())
    n_xl = int((x < xl).sum())
    jl = int(((x < xl) & (y < yl)).sum())
    return xu, yu, xl, yl, n_xu, ju, n_xl, jl


def test_brute_force_parity(spark):
    rng = np.random.default_rng(13)
    x = rng.integers(1000, 9000, size=60)
    y = rng.integers(1000, 9000, size=60)
    rows = _rows("a", "x", list(enumerate(x))) + _rows(
        "a", "y", list(enumerate(y))
    )
    out = tail_dependence(_mk(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    xu, yu, xl, yl, n_xu, ju, n_xl, jl = _brute(x, y)
    assert (r["xu"], r["yu"], r["xl"], r["yl"]) == (xu, yu, xl, yl)
    assert (r["n_xu"], r["ju"], r["n_xl"], r["jl"]) == (n_xu, ju, n_xl, jl)
    if n_xu:
        assert abs(r["lambda_u"] - ju / n_xu) < 1e-6


def test_comonotone_vs_antimonotone(spark):
    rng = np.random.default_rng(17)
    x = np.sort(rng.integers(1000, 99000, size=80))
    rng.shuffle(x)
    co = _rows("co", "x", list(enumerate(x))) + _rows(
        "co", "y", list(enumerate(x * 2))
    )
    anti = _rows("anti", "x", list(enumerate(x))) + _rows(
        "anti", "y", list(enumerate(200000 - x))
    )
    out = {
        r["key"]: r
        for r in tail_dependence(_mk(spark, co + anti)).collect()
    }
    assert out["co"]["lambda_u"] == 1.0  # joint extremes coincide
    assert out["co"]["lambda_l"] == 1.0
    assert out["anti"]["lambda_u"] == 0.0  # opposite tails never joint
    assert out["anti"]["lambda_l"] == 0.0


def test_constant_side_null_and_min_obs(spark):
    rows = _rows("c", "x", [(h, 500) for h in range(60)]) + _rows(
        "c", "y", [(h, 100 * h + 7) for h in range(60)]
    )
    rows += _rows("short", "x", [(h, h) for h in range(5)]) + _rows(
        "short", "y", [(h, h) for h in range(5)]
    )
    out = {r["key"]: r for r in tail_dependence(_mk(spark, rows)).collect()}
    assert set(out) == {"c"}  # short key dropped
    # constant x: nothing strictly above/below its only value
    assert out["c"]["n_xu"] == 0 and out["c"]["lambda_u"] is None
    assert out["c"]["n_xl"] == 0 and out["c"]["lambda_l"] is None


def test_locf_alignment(spark):
    # y has a gap at hours 2-3: LOCF carries hour-1's value, so the
    # grid pairs (x_h, y_1) there — verify against the filled series
    x = [(h, 1000 + 100 * h) for h in range(60)]
    y = [(h, 9000 - 100 * h) for h in range(60) if h not in (2, 3)]
    rows = _rows("a", "x", x) + _rows("a", "y", y)
    out = tail_dependence(_mk(spark, rows)).collect()[0]
    xf = [c for _, c in x]
    yf = []
    last = None
    ymap = dict(y)
    for h in range(60):
        if h in ymap:
            last = ymap[h]
        yf.append(last)
    want = _brute(xf, yf)
    got = (out["xu"], out["yu"], out["xl"], out["yl"],
           out["n_xu"], out["ju"], out["n_xl"], out["jl"])
    assert got == want
