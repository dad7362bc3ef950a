"""Peak prominence: O(n^2) brute-force parity, a hand-computed
textbook profile, plateau exclusion and the dedup rule."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.peaks import peak_prominence

BASE = dt.datetime(2024, 1, 1)


def _rows(key, cents, sec_step=60):
    return [
        (key, BASE + dt.timedelta(seconds=i * sec_step), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(c):
    """All strict interior peaks with scipy-definition prominence."""
    c = np.asarray(c, dtype=np.int64)
    n = c.size
    out = {}
    for i in range(1, n - 1):
        if not (c[i] > c[i - 1] and c[i] > c[i + 1]):
            continue
        lo = -1
        for s in range(i - 1, -1, -1):
            if c[s] > c[i]:
                lo = s
                break
        hi = n
        for s in range(i + 1, n):
            if c[s] > c[i]:
                hi = s
                break
        lmin = int(c[lo + 1: i].min())
        rmin = int(c[i + 1: hi].min())
        out[i] = int(c[i]) - max(lmin, rmin)
    return out


def test_textbook_profile(spark):
    #      idx: 0   1   2   3   4   5   6   7   8
    cents = [100, 500, 200, 400, 300, 900, 100, 300, 50]
    out = peak_prominence(_mk(spark, _rows("a", cents))).collect()
    got = {(r["c"], r["prom"]) for r in out}
    # peak@1 (500): higher ground right at idx5; base max(100, 200)=200 -> 300
    # peak@3 (400): bases max(200, 300)=300 -> 100
    # peak@5 (900): no higher ground; bases max(100, 50)=100 -> 800
    # peak@7 (300): bases max(100, 50)=100 -> 200
    assert got == {(500, 300), (400, 100), (900, 800), (300, 200)}
    # rank by prominence desc
    by_rk = sorted(out, key=lambda r: r["rk"])
    assert [r["c"] for r in by_rk] == [900, 500, 300, 400]


def test_brute_force_parity(spark):
    rng = np.random.default_rng(31)
    cents = rng.integers(0, 2000, size=300)
    out = peak_prominence(
        _mk(spark, _rows("a", cents)), top_k=10_000
    ).collect()
    want = _brute(cents)
    got = {}
    us0 = int(BASE.timestamp()) * 1_000_000
    for r in out:
        i = (r["us"] - us0) // 60_000_000
        got[int(i)] = r["prom"]
    assert got == want


def test_plateau_excluded_and_short_series(spark):
    # plateau 500,500 is not a strict peak; series of 2 emits nothing
    rows = _rows("p", [100, 500, 500, 100, 600, 90, 620])
    rows += _rows("s", [1, 2])
    out = peak_prominence(_mk(spark, rows)).collect()
    assert {r["key"] for r in out} == {"p"}
    # idx6 (620) is the series end, not an interior peak; the 600
    # peak's higher ground is 620 on the right, bases max(100, 90)
    assert {(r["c"], r["prom"]) for r in out} == {(600, 500)}


def test_dup_timestamp_max_rule(spark):
    # same timestamp twice: max cents wins, turning idx1 into a peak
    rows = _rows("a", [100, 200, 150, 90, 500])
    rows.append(("a", BASE + dt.timedelta(seconds=60), 9.0))  # 900 @ idx1
    out = peak_prominence(_mk(spark, rows)).collect()
    # dedup'd series is [100, 900, 150, 90, 500]: only idx1 is a peak
    assert {(r["c"], r["prom"]) for r in out} == {(900, 800)}
