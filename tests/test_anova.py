"""Balanced one-way ANOVA + Brown-Forsythe on the complete-week
weekday spine: numpy brute-force parity (textbook SSB/SSW on the
zero-filled cells), planted level / planted spread effects,
degenerate-denominator NULLs."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.anova import anova_weekday, brown_forsythe_weekday

BASE = dt.datetime(2024, 1, 1)  # epoch day 19723


def _t(day, sec=0):
    return BASE + dt.timedelta(days=int(day), seconds=int(sec))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


EPOCH_DAY0 = 19723  # epoch day of BASE; 19723 % 7 == 4, so the brute
# must work in ABSOLUTE epoch days or its week boundaries shift


def _cells(counts_by_day_rel):
    """Zero-filled complete-week cells: {trt: [counts over blocks]}."""
    counts_by_day = {EPOCH_DAY0 + d: c for d, c in counts_by_day_rel.items()}
    days = sorted(counts_by_day)
    mn, mx = days[0], days[-1]
    groups = {j: [] for j in range(7)}
    for dd in range(mn, mx + 1):
        blk, trt = dd // 7, dd % 7
        if blk * 7 >= mn and blk * 7 + 6 <= mx:
            groups[trt].append(counts_by_day.get(dd, 0))
    return {j: np.array(v, dtype=np.int64) for j, v in groups.items()}


def _brute_anova(groups):
    n = len(groups[0])
    sj = np.array([g.sum() for g in groups.values()], dtype=np.int64)
    u = int((sj.astype(object) ** 2).sum())
    t = int(sj.sum())
    q = int(sum(int((g.astype(object) ** 2).sum()) for g in groups.values()))
    ssb_num = 7 * u - t * t
    ssw_num = n * q - u
    sst_num = 7 * n * q - t * t
    f = None if ssw_num <= 0 else (n - 1) * ssb_num / (6 * ssw_num)
    eta2 = None if sst_num <= 0 else ssb_num / sst_num
    return n, u, t, q, f, eta2


def _brute_bf(groups):
    dev = {}
    for j, g in groups.items():
        s = np.sort(g)
        n = len(s)
        m2 = int(s[(n + 1) // 2 - 1]) + int(s[(n + 2) // 2 - 1])
        dev[j] = np.abs(2 * g - m2)
    return _brute_anova(dev)


def test_anova_brute_force_parity(spark):
    rng = np.random.default_rng(17)
    rows, per_key = [], {}
    for k in range(4):
        counts = {}
        for d in sorted(rng.choice(70, size=45, replace=False).tolist()):
            c = int(rng.integers(1, 12))
            counts[d] = c
            rows += [(f"k{k}", _t(d, s)) for s in range(c)]
        per_key[f"k{k}"] = counts
    got = {r["key"]: r for r in anova_weekday(_mk(spark, rows)).collect()}
    gbf = {
        r["key"]: r
        for r in brown_forsythe_weekday(_mk(spark, rows)).collect()
    }
    for k, counts in per_key.items():
        groups = _cells(counts)
        n, u, t, q, f, eta2 = _brute_anova(groups)
        assert (got[k]["n_blocks"], got[k]["u"], got[k]["t"], got[k]["q"]) \
            == (n, u, t, q)
        assert got[k]["f_stat"] == round(f, 6)
        assert got[k]["eta2"] == round(eta2, 6)
        n, u, t, q, f, eta2 = _brute_bf(groups)
        assert (gbf[k]["n_blocks"], gbf[k]["u"], gbf[k]["t"], gbf[k]["q"]) \
            == (n, u, t, q)
        assert gbf[k]["f_stat"] == round(f, 6)


def test_anova_planted_weekday_level_vs_flat(spark):
    rows = []
    for wk in range(8):
        for j in range(7):
            d = wk * 7 + j
            # "lvl": one weekday ~5x busier (within-group wobble keeps
            # SSW > 0 — a PERFECT effect would make F infinite -> NULL)
            c_lvl = (15 + wk % 2) if j == 0 else (3 + (wk + j) % 2)
            rows += [("lvl", _t(d, s)) for s in range(c_lvl)]
            rows += [("flat", _t(d, s)) for s in range(3 + (wk + j) % 2)]
    out = {r["key"]: r for r in anova_weekday(_mk(spark, rows)).collect()}
    assert out["lvl"]["f_stat"] > 50.0
    assert out["lvl"]["eta2"] > 0.8
    assert out["flat"]["f_stat"] < 3.0


def test_bf_planted_spread_with_equal_means(spark):
    """One weekday alternates 1/19 (mean 10, huge spread), the rest
    sit at 9/11 (mean 10, tiny spread): ANOVA sees nothing, BF fires."""
    rows = []
    for wk in range(11):  # 11 part-weeks -> 10 retained absolute blocks
        for j in range(7):
            d = wk * 7 + j
            if j == 3:
                c = 1 if wk % 2 == 0 else 19
            else:
                c = 9 if wk % 2 == 0 else 11
            rows += [("sp", _t(d, s)) for s in range(c)]
    a = anova_weekday(_mk(spark, rows)).collect()[0]
    b = brown_forsythe_weekday(_mk(spark, rows)).collect()[0]
    assert a["f_stat"] == 0.0  # means identical across weekdays
    # spreads differ PERFECTLY: within-group deviation variance is 0,
    # the infinite-F signature -> f_stat NULL with eta2 == 1
    assert b["f_stat"] is None and b["eta2"] == 1.0


def test_anova_constant_key_is_null(spark):
    rows = []
    for d in range(30):  # 30-day span -> >= 3 complete absolute weeks
        rows += [("const", _t(d, s)) for s in range(4)]
    a = anova_weekday(_mk(spark, rows)).collect()[0]
    assert a["f_stat"] is None and a["eta2"] is None
    b = brown_forsythe_weekday(_mk(spark, rows)).collect()[0]
    assert b["f_stat"] is None


def test_anova_min_blocks_drops_short_keys(spark):
    rows = [("short", _t(d, s)) for d in range(9) for s in range(2)]
    assert anova_weekday(_mk(spark, rows), min_blocks=2).count() == 0
    # 30-day span -> >= 3 complete absolute weeks: BF keeps it
    rows = [("ok3", _t(d, s)) for d in range(30) for s in range((d % 3) + 1)]
    assert brown_forsythe_weekday(_mk(spark, rows)).count() == 1
