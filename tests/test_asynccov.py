from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.asynccov import hy_cov, hy_lead_lag

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _brute_hy(xs, ys):
    """Reference: the literal pairwise interval-overlap sum (exact
    ints, cents)."""
    xs = sorted(xs)
    ys = sorted(ys)
    xc = [int(round(v * 100)) for _, v in xs]
    yc = [int(round(v * 100)) for _, v in ys]
    xiv = [
        (xs[i - 1][0], xs[i][0], xc[i] - xc[i - 1]) for i in range(1, len(xs))
    ]
    yiv = [
        (ys[j - 1][0], ys[j][0], yc[j] - yc[j - 1]) for j in range(1, len(ys))
    ]
    cov = n_pairs = 0
    for xb, xe, dx in xiv:
        for yb, ye, dy in yiv:
            if yb < xe and ye > xb:
                cov += dx * dy
                n_pairs += 1
    vx = sum(d * d for _, _, d in xiv)
    vy = sum(d * d for _, _, d in yiv)
    return cov, n_pairs, vx, vy


def test_hy_cov_matches_bruteforce_random(spark):
    rng = np.random.default_rng(11)
    rows = []
    expect = {}
    for k in range(6):
        nx, ny = rng.integers(2, 40, 2)
        # asynchronous, irregular, overlapping-but-offset spans
        xt = np.sort(rng.uniform(0, 5000, nx))
        yt = np.sort(rng.uniform(-500, 4500, ny))
        xv = rng.normal(100, 15, nx).round(2)
        yv = rng.normal(50, 8, ny).round(2)
        key = f"k{k}"
        rows += [(key, _t(t), float(v), "x") for t, v in zip(xt, xv)]
        rows += [(key, _t(t), float(v), "y") for t, v in zip(yt, yv)]
        expect[key] = _brute_hy(
            list(zip(xt.tolist(), xv.tolist())),
            list(zip(yt.tolist(), yv.tolist())),
        )
    got = {
        r["key"]: r
        for r in hy_cov(_mk(spark, rows)).collect()
    }
    assert set(got) == set(expect)
    for k, (cov, n_pairs, vx, vy) in expect.items():
        r = got[k]
        assert int(r["cov_q"]) == cov, k
        assert r["n_pairs"] == n_pairs, k
        assert int(r["vx_q"]) == vx and int(r["vy_q"]) == vy, k


def test_hy_cov_edges_and_tie_collapse(spark):
    # X intervals entirely before / after Y's span contribute nothing;
    # duplicate (key, series, ts) ticks collapse to max(cents) BEFORE
    # interval construction (the determinism guard).
    rows = [
        ("a", _t(0), 1.0, "x"), ("a", _t(1), 2.0, "x"),   # before Y
        ("a", _t(10), 5.0, "x"), ("a", _t(20), 9.0, "x"),  # overlaps
        ("a", _t(90), 3.0, "x"), ("a", _t(95), 4.0, "x"),  # after Y
        ("a", _t(8), 10.0, "y"), ("a", _t(15), 12.0, "y"),
        ("a", _t(25), 11.0, "y"),
        # duplicate tick: collapses to max -> value 7.0 at t=15 ignored
        ("b", _t(0), 1.0, "x"), ("b", _t(30), 2.0, "x"),
        ("b", _t(15), 7.0, "y"), ("b", _t(15), 9.0, "y"),
        ("b", _t(10), 5.0, "y"), ("b", _t(20), 6.0, "y"),
    ]
    got = {r["key"]: r for r in hy_cov(_mk(spark, rows)).collect()}
    # key a overlaps: X(1,10] d=+300 with Y(8,15] d=+200 -> 60000;
    # X(10,20] d=+400 with both Y intervals -> 400*200-400*100 = 40000;
    # X(20,90] d=-600 with Y(15,25] d=-100 -> 60000. The edge intervals
    # X(0,1] and X(90,95] overlap nothing. Total 160000 over 4 pairs.
    assert int(got["a"]["cov_q"]) == 160000
    assert got["a"]["n_pairs"] == 4
    # key b: ticks at 10(500),15(max 900),20(600); X d=+100 overlaps all
    # -> 100*(400) + 100*(-300) = 10000, 2 pairs
    assert int(got["b"]["cov_q"]) == 10000
    assert got["b"]["n_pairs"] == 2


def test_hy_lead_lag_planted_delay(spark):
    # Y is X delayed by exactly 3600 s: shifting X forward by +3600
    # aligns the increments, so theta=+3600 must win argmax |cov_q|.
    rng = np.random.default_rng(7)
    xt = np.sort(rng.uniform(0, 200_000, 120))
    xv = np.cumsum(rng.normal(0, 2, 120)) + 500
    rows = [("k", _t(t), float(round(v, 2)), "x") for t, v in zip(xt, xv)]
    rows += [
        ("k", _t(t + 3600), float(round(v, 2)), "y") for t, v in zip(xt, xv)
    ]
    out = hy_lead_lag(
        _mk(spark, rows), offsets_s=(-7200, -3600, 0, 3600, 7200)
    ).collect()
    best = [r for r in out if r["is_best"]]
    assert len(best) == 1 and best[0]["theta_s"] == 3600
    by_theta = {r["theta_s"]: int(r["cov_q"]) for r in out}
    assert by_theta[3600] == max(abs(v) for v in by_theta.values())
    # perfectly aligned shift reproduces the X realized variance
    vx = sum(
        (int(round(b * 100)) - int(round(a * 100))) ** 2
        for a, b in zip(xv[:-1], xv[1:])
    )
    assert by_theta[3600] == vx
