from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.transfer_entropy import transfer_entropy

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600.0


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _brute_te(y_bits, x_bits):
    """Plug-in TE over explicit dict counts — an independent path from
    the operator's 16-column lattice algebra."""
    trip_xy = list(zip(y_bits[2:], y_bits[1:-1], x_bits[1:-1]))
    trip_yx = list(zip(x_bits[2:], x_bits[1:-1], y_bits[1:-1]))
    n = len(trip_xy)

    def te(trips):
        from collections import Counter

        c3 = Counter(trips)
        ctx = Counter((p, o) for _, p, o in trips)
        tgt = Counter((t, p) for t, p, _ in trips)
        past = Counter(p for _, p, _ in trips)
        s = 0.0
        for t in (0, 1):
            for p in (0, 1):
                for o in (0, 1):
                    c = c3[(t, p, o)]
                    if c > 0:
                        s += c * math.log(
                            (c * past[p]) / (ctx[(p, o)] * tgt[(t, p)])
                        )
        return s / n

    return n, te(trip_xy), te(trip_yx)


def test_te_planted_direction(spark):
    """y copies x's previous move: information flows x->y, so
    te_xy >> te_yx, while an independent pair stays near zero both
    ways."""
    rng = np.random.default_rng(5)
    n = 400
    rows = []
    x = np.cumsum(rng.choice([-1.0, 1.0], n)) + 100
    y = np.empty(n)
    y[0] = 50.0
    for i in range(1, n):
        # y's move this hour = x's move last hour (deterministic copy)
        y[i] = y[i - 1] + (x[i - 1] - x[i - 2] if i >= 2 else 1.0)
    for i in range(n):
        rows.append(("coupled", _t(i * HOUR + 60), float(x[i]), "x"))
        rows.append(("coupled", _t(i * HOUR + 120), float(y[i]), "y"))
    xi = np.cumsum(rng.choice([-1.0, 1.0], n)) + 100
    yi = np.cumsum(rng.choice([-1.0, 1.0], n)) + 50
    for i in range(n):
        rows.append(("indep", _t(i * HOUR + 60), float(xi[i]), "x"))
        rows.append(("indep", _t(i * HOUR + 120), float(yi[i]), "y"))

    out = {r["key"]: r for r in transfer_entropy(_mk(spark, rows)).collect()}
    # deterministic copy of a binary move carries ~ln(2) nats
    assert out["coupled"]["te_xy"] > 0.5
    assert out["coupled"]["te_xy"] > 10 * max(out["coupled"]["te_yx"], 0.01)
    assert out["indep"]["te_xy"] < 0.05
    assert out["indep"]["te_yx"] < 0.05


def test_te_matches_bruteforce(spark):
    """Random irregular series: operator output equals the independent
    Counter-based plug-in estimate to 6dp on the same grid."""
    rng = np.random.default_rng(31)
    rows = []
    expect = {}
    for k in range(4):
        nx, ny = rng.integers(40, 90, 2)
        xt = np.sort(rng.uniform(0, 60 * HOUR, nx))
        yt = np.sort(rng.uniform(0, 60 * HOUR, ny))
        xv = rng.normal(100, 15, nx).round(2)
        yv = rng.normal(50, 8, ny).round(2)
        key = f"k{k}"
        rows += [(key, _t(t), float(v), "x") for t, v in zip(xt, xv)]
        rows += [(key, _t(t), float(v), "y") for t, v in zip(yt, yv)]
        # LOCF grid exactly as the operator builds it
        bx, by = {}, {}
        for t, v in zip(xt, xv):
            bx[int(t // HOUR)] = int(round(v * 100))
        for t, v in zip(yt, yv):
            by[int(t // HOUR)] = int(round(v * 100))
        lo = min(min(bx), min(by))
        hi = max(max(bx), max(by))
        gx, gy = [], []
        cx = cy = None
        for b in range(lo, hi + 1):
            cx = bx.get(b, cx)
            cy = by.get(b, cy)
            gx.append(cx)
            gy.append(cy)
        # operator rows are grid positions whose lag-2 values resolve
        # on both sides == everything from 2 past the first index
        # where both sides are non-null (LOCF never un-resolves)
        start = next(
            i for i in range(len(gx))
            if gx[i] is not None and gy[i] is not None
        )
        gx, gy = gx[start:], gy[start:]
        ybits = [int(gy[i] > gy[i - 1]) for i in range(1, len(gy))]
        xbits = [int(gx[i] > gx[i - 1]) for i in range(1, len(gx))]
        if len(ybits) >= 26:
            expect[key] = _brute_te([None] + ybits, [None] + xbits)

    got = {r["key"]: r for r in transfer_entropy(_mk(spark, rows)).collect()}
    assert set(got) == set(expect)
    for k, (n, te_xy, te_yx) in expect.items():
        assert got[k]["n_obs"] == n, k
        assert got[k]["te_xy"] == round(te_xy, 6) + 0.0, k
        assert got[k]["te_yx"] == round(te_yx, 6) + 0.0, k
