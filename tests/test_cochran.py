"""Cochran Q + McNemar binary activity tests: brute-force parity on
the zero-filled spines, planted weekday-presence / asymmetric-churn
effects, degenerate NULLs."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.cochran import cochran_q_weekday, mcnemar_ampm

BASE = dt.datetime(2024, 1, 1)
EPOCH_DAY0 = 19723  # BASE's epoch day; brute must use ABSOLUTE days


def _t(day, sec=0):
    return BASE + dt.timedelta(days=int(day), seconds=int(sec))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _brute_q(active_days_rel):
    act = {EPOCH_DAY0 + d for d in active_days_rel}
    mn, mx = min(act), max(act)
    blocks = {}
    for dd in range(mn, mx + 1):
        blk, trt = dd // 7, dd % 7
        if blk * 7 >= mn and blk * 7 + 6 <= mx:
            blocks.setdefault(blk, {})[trt] = 1 if dd in act else 0
    n = len(blocks)
    cj = np.zeros(7, dtype=np.int64)
    rb2 = 0
    for cells in blocks.values():
        row = np.array([cells[t] for t in range(7)], dtype=np.int64)
        cj += row
        rb2 += int(row.sum()) ** 2
    n_act = int(cj.sum())
    cj2 = int((cj * cj).sum())
    den = 7 * n_act - rb2
    q = None if den <= 0 else 6 * (7 * cj2 - n_act * n_act) / den
    return n, n_act, cj2, rb2, q


def _brute_mcnemar(day_hours):
    """day_hours: dict rel-day -> set of event hours (0..23)."""
    b = c = 0
    for hours in day_hours.values():
        am = any(h < 12 for h in hours)
        pm = any(h >= 12 for h in hours)
        b += am and not pm
        c += pm and not am
    stat = None if b + c == 0 else (b - c) ** 2 / (b + c)
    return len(day_hours), b, c, stat


def test_brute_force_parity(spark):
    rng = np.random.default_rng(53)
    rows, per_key, per_key_hours = [], {}, {}
    for k in range(4):
        days = sorted(rng.choice(60, size=25, replace=False).tolist())
        per_key[f"k{k}"] = days
        hours = {
            d: {int(h) for h in rng.integers(0, 24, size=3)} for d in days
        }
        per_key_hours[f"k{k}"] = hours
        rows += [
            (f"k{k}", _t(d, h * 3600)) for d in days for h in hours[d]
        ]
    gq = {r["key"]: r for r in cochran_q_weekday(_mk(spark, rows)).collect()}
    gm = {r["key"]: r for r in mcnemar_ampm(_mk(spark, rows)).collect()}
    for k, days in per_key.items():
        n, n_act, cj2, rb2, q = _brute_q(days)
        assert (gq[k]["n_blocks"], gq[k]["n_act"], gq[k]["sum_cj2"],
                gq[k]["sum_rb2"]) == (n, n_act, cj2, rb2)
        assert gq[k]["q_stat"] == (None if q is None else round(q, 6))
        n_days, b, c, stat = _brute_mcnemar(per_key_hours[k])
        assert (gm[k]["n_days"], gm[k]["b_am"], gm[k]["c_pm"]) \
            == (n_days, b, c)
        assert gm[k]["mcnemar"] == (
            None if stat is None else round(stat, 6) + 0.0
        )


def test_cochran_planted_weekday_presence(spark):
    rows = []
    for wk in range(10):
        for j in range(7):
            d = wk * 7 + j
            # "wd": weekdays 0-3 always active, 4-6 active 1 week in 5
            if j <= 3 or wk % 5 == 0:
                rows.append(("wd", _t(d)))
            # "all": every day active (no discrimination -> NULL)
            rows.append(("all", _t(d)))
    out = {r["key"]: r for r in cochran_q_weekday(_mk(spark, rows)).collect()}
    assert out["wd"]["q_stat"] > 12.6  # chi2(6) 95% cv
    assert out["all"]["q_stat"] is None


def test_mcnemar_balanced_vs_evening_drift(spark):
    rows = []
    # "bal": discordant days alternate morning-only / evening-only
    for d in range(20):
        rows.append(("bal", _t(d, (4 if d % 2 == 0 else 16) * 3600)))
    # "drift": every discordant day is evening-only
    for d in range(20):
        if d % 2 == 0:
            rows.append(("drift", _t(d, 4 * 3600)))
            rows.append(("drift", _t(d, 16 * 3600)))  # concordant day
        else:
            rows.append(("drift", _t(d, 16 * 3600)))  # evening only
    out = {r["key"]: r for r in mcnemar_ampm(_mk(spark, rows)).collect()}
    assert out["bal"]["b_am"] == out["bal"]["c_pm"] == 10
    assert out["bal"]["mcnemar"] == 0.0
    assert out["drift"]["b_am"] == 0 and out["drift"]["c_pm"] == 10
    assert out["drift"]["mcnemar"] == 10.0  # (0-10)^2/10


def test_mcnemar_all_concordant_is_null(spark):
    rows = []
    for d in range(12):
        rows.append(("both", _t(d, 4 * 3600)))
        rows.append(("both", _t(d, 16 * 3600)))
    got = mcnemar_ampm(_mk(spark, rows)).collect()[0]
    assert got["b_am"] == 0 and got["c_pm"] == 0
    assert got["mcnemar"] is None
