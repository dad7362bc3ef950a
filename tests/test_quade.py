"""Quade range-weighted Friedman: brute-force parity on the
quadrupled integer lattice, weekday-effect detection with
large-effect weeks dominating, perfect-concordance NULL."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.quade import quade_weekday

EPOCH = dt.datetime(1970, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _mk(key, weekly_counts):
    """weekly_counts: list of 7-int lists; week w day t gets count
    c events. Emits one row per event on (epoch week w, weekday t)."""
    rows = []
    for w, week in enumerate(weekly_counts):
        assert len(week) == 7
        for t, c in enumerate(week):
            day = EPOCH + dt.timedelta(weeks=w, days=t)
            for j in range(c):
                rows.append((key, day + dt.timedelta(minutes=j)))
    return rows


def _mid2(vals):
    """Doubled midranks (2*rank + ties - 1) of vals in order."""
    out = []
    svals = sorted(vals)
    for v in vals:
        below = sum(1 for x in svals if x < v)
        ties = sum(1 for x in svals if x == v)
        out.append(2 * (below + 1) + ties - 1)
    return out


def _brute(weekly_counts):
    k = 7
    n = len(weekly_counts)
    r2 = [_mid2(week) for week in weekly_counts]
    ranges = [max(w) - min(w) for w in weekly_counts]
    q2 = _mid2(ranges)
    s4 = [
        [q2[i] * (r2[i][j] - (k + 1)) for j in range(k)] for i in range(n)
    ]
    sj = [sum(s4[i][j] for i in range(n)) for j in range(k)]
    sb = sum(x * x for x in sj)
    a4 = sum(x * x for row in s4 for x in row)
    den = n * a4 - sb
    f = round((n - 1) * sb / float(den), 6) + 0.0 if den > 0 else None
    return n, sb, a4, f


def test_quade_brute_force_parity(spark):
    rng = np.random.default_rng(1213)
    rows, keys = [], {}
    for ki in range(3):
        weeks = [
            [int(c) for c in rng.integers(0, 8, 7)] for _ in range(6)
        ]
        # the spine spans observed days only: anchor both corners so
        # every fixture week is complete
        weeks[0][0] = max(weeks[0][0], 1)
        weeks[-1][6] = max(weeks[-1][6], 1)
        keys[f"k{ki}"] = weeks
        rows += _mk(f"k{ki}", weeks)
    got = {r["key"]: r for r in quade_weekday(_df(spark, rows)).collect()}
    for k, weeks in keys.items():
        # zero-count days at the week boundary may trim the spine:
        # constrain fixtures to nonzero first/last day
        n, sb, a4, f = _brute(weeks)
        r = got[k]
        assert (r["n_blocks"], r["sb"], r["a4"]) == (n, sb, a4)
        assert r["quade_f"] == f


def test_quade_weights_large_effect_weeks(spark):
    rng = np.random.default_rng(1217)
    # wide-range noise weeks (F ~ 1) vs a consistent Friday spike
    noise = [[int(c) for c in rng.integers(0, 40, 7)] for _ in range(8)]
    noise[0][0] = max(noise[0][0], 1)
    noise[-1][6] = max(noise[-1][6], 1)
    spiky = []
    for _ in range(8):
        wk = [int(c) for c in rng.integers(0, 40, 7)]
        wk[4] += 100
        spiky.append(wk)
    spiky[0][0] = max(spiky[0][0], 1)
    spiky[-1][6] = max(spiky[-1][6], 1)
    rows = _mk("noise", noise) + _mk("spiky", spiky)
    got = {r["key"]: r for r in quade_weekday(_df(spark, rows)).collect()}
    assert got["spiky"]["quade_f"] > 3 * max(got["noise"]["quade_f"], 0.2)


def test_quade_perfect_concordance_null(spark):
    # identical strictly-increasing pattern every week with a single
    # week-range tie structure: n*A == SB -> NULL
    weeks = [[1, 2, 3, 4, 5, 6, 7]] * 4
    rows = _mk("p", weeks)
    out = quade_weekday(_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["quade_f"] is None
