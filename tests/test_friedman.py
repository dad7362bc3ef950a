"""Friedman weekday test: numpy brute-force parity (midranks + the
tie-corrected statistic), planted weekday effect, all-tied NULL,
boundary-week exclusion and zero-fill."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.friedman import friedman_weekday

BASE = dt.datetime(2024, 1, 1)  # epoch day 19723; 19723 % 7 == 4
DAY = 86400


def _t(day, sec=0):
    return BASE + dt.timedelta(days=int(day), seconds=int(sec))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _brute(counts_by_day):
    """counts_by_day: dict day->count over a contiguous span."""
    days = sorted(counts_by_day)
    mn, mx = days[0], days[-1]
    cells = {}
    for dd in range(mn, mx + 1):
        blk, trt = dd // 7, dd % 7
        if blk * 7 >= mn and blk * 7 + 6 <= mx:
            cells.setdefault(blk, {})[trt] = counts_by_day.get(dd, 0)
    n = len(cells)
    r2j = np.zeros(7, dtype=np.int64)
    a4 = 0
    for blk in cells.values():
        vals = np.array([blk[t] for t in range(7)], dtype=np.int64)
        order = np.argsort(vals, kind="mergesort")
        r2 = np.zeros(7, dtype=np.int64)
        i = 0
        while i < 7:
            j = i
            while j + 1 < 7 and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            # midrank of positions i..j (1-indexed): (i+1 + j+1)/2
            mid2 = (i + 1) + (j + 1)
            for p in range(i, j + 1):
                r2[order[p]] = mid2
            i = j + 1
        r2j += r2
        a4 += int((r2 * r2).sum())
    num = int(((r2j - 8 * n) ** 2).sum())
    den = a4 - 448 * n
    chi2 = None if den <= 0 else 6.0 * num / den
    return n, num, a4, chi2


def test_brute_force_parity(spark):
    rng = np.random.default_rng(13)
    rows, expect = [], {}
    for key in ("a", "b"):
        # 24-day span starting at an arbitrary offset (partial edge weeks)
        start = 2 if key == "a" else 5
        counts = {}
        for d in range(start, start + 24):
            c = int(rng.integers(0, 4))
            counts[d] = c
            for i in range(c):
                rows.append((key, _t(d, 100 * i + 1)))
        # ensure first/last day observed so the span matches
        if counts[start] == 0:
            counts[start] = 1
            rows.append((key, _t(start, 7)))
        if counts[start + 23] == 0:
            counts[start + 23] = 1
            rows.append((key, _t(start + 23, 7)))
        base_day = 19723  # epoch day of BASE
        expect[key] = _brute(
            {base_day + d: c for d, c in counts.items() if c > 0 or True}
        )
    # drop zero-count days from input (they exist only via zero-fill)
    out = {r["key"]: r for r in friedman_weekday(_mk(spark, rows)).collect()}
    for key, (n, num, a4, chi2) in expect.items():
        r = out[key]
        assert r["n_blocks"] == n
        assert r["num"] == num and r["a4"] == a4
        if chi2 is None:
            assert r["chi2"] is None
        else:
            assert abs(r["chi2"] - chi2) < 1e-6


def test_planted_weekday_effect(spark):
    rows = []
    # "flat": identical count every day -> all tied -> NULL chi2
    for d in range(0, 28):
        for i in range(2):
            rows.append(("flat", _t(d, 10 * i + 1)))
    # "spike": weekday (d % 7 == 0) has 10 events, others 1
    for d in range(0, 28):
        c = 10 if (19723 + d) % 7 == 0 else 1
        for i in range(c):
            rows.append(("spike", _t(d, 10 * i + 1)))
    out = {r["key"]: r for r in friedman_weekday(_mk(spark, rows)).collect()}
    assert out["flat"]["chi2"] is None  # every block fully tied
    # k-1 = 6 is the chi2 df; with 4 blocks and six-way ties each week
    # the pure 1-of-7 effect lands at 18.0 (p < 0.01 at 6 df)
    assert out["spike"]["chi2"] > 15


def test_boundary_weeks_excluded_and_zero_fill(spark):
    # observed span epoch-days [19725, 19735]: only week starting 19726
    # (= 7 * 2818) lies fully inside -> exactly 1 complete block,
    # below min_blocks=2 -> key dropped
    rows = [("k", _t(2)), ("k", _t(12))]
    assert friedman_weekday(_mk(spark, rows), min_blocks=2).count() == 0
    # with min_blocks=1 the key appears and the silent days rank as 0s
    r = friedman_weekday(_mk(spark, rows), min_blocks=1).collect()[0]
    assert r["n_blocks"] == 1
    # week cells: day 19726..19732 -> counts all 0 except day 19726+? :
    # observed days are 19725 (excluded, boundary) and 19735 (excluded)
    # -> all 7 cells are zero-filled ties -> chi2 NULL
    assert r["chi2"] is None


def _brute_page(counts_by_hour):
    """counts_by_hour: dict epoch-hour -> count over a contiguous span.
    Returns (n_blocks, l2, z) over zero-filled complete days."""
    hours = sorted(counts_by_hour)
    mn, mx = hours[0], hours[-1]
    blocks = {}
    for hh in range(mn, mx + 1):
        blk, trt = hh // 24, hh % 24
        if blk * 24 >= mn and blk * 24 + 23 <= mx:
            blocks.setdefault(blk, {})[trt] = counts_by_hour.get(hh, 0)
    n = len(blocks)
    l2 = 0
    for cells in blocks.values():
        vals = np.array([cells[t] for t in range(24)], dtype=np.int64)
        order = np.argsort(vals, kind="mergesort")
        r2 = np.zeros(24, dtype=np.int64)
        i = 0
        while i < 24:
            j = i
            while j + 1 < 24 and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            for p in range(i, j + 1):
                r2[order[p]] = (i + 1) + (j + 1)
            i = j + 1
        l2 += int(((np.arange(24) + 1) * r2).sum())
    z = (l2 - 7500.0 * n) / (2.0 * (57500.0 * n) ** 0.5)
    return n, l2, z


def test_page_brute_force_parity(spark):
    from tits_spark.operators.friedman import page_trend_hourly

    rng = np.random.default_rng(23)
    rows, per_key = [], {}
    base_hour = 19723 * 24
    for k in range(3):
        counts = {}
        for off in sorted(rng.choice(24 * 9, size=60, replace=False).tolist()):
            c = int(rng.integers(1, 6))
            counts[base_hour + off] = c
            rows += [
                (f"k{k}", BASE + dt.timedelta(hours=off, seconds=s))
                for s in range(c)
            ]
        per_key[f"k{k}"] = counts
    got = {
        r["key"]: r for r in page_trend_hourly(
            spark.createDataFrame(rows, "key string, ts timestamp")
        ).collect()
    }
    for k, counts in per_key.items():
        n, l2, z = _brute_page(counts)
        assert (got[k]["n_blocks"], got[k]["l2"]) == (n, l2)
        assert got[k]["z"] == round(z, 6) + 0.0


def test_page_planted_monotone_vs_shuffled(spark):
    from tits_spark.operators.friedman import page_trend_hourly

    rows = []
    for d in range(6):
        for h in range(24):
            # "up": count rises with the hour; "mix": same multiset,
            # hour order scrambled by a fixed permutation
            rows += [
                ("up", BASE + dt.timedelta(days=d, hours=h, seconds=s))
                for s in range(h + 1)
            ]
            hp = (h * 7 + 3) % 24
            rows += [
                ("mix", BASE + dt.timedelta(days=d, hours=hp, seconds=s))
                for s in range(h + 1)
            ]
    out = {
        r["key"]: r for r in page_trend_hourly(
            spark.createDataFrame(rows, "key string, ts timestamp")
        ).collect()
    }
    assert out["up"]["z"] > 10.0
    assert abs(out["mix"]["z"]) < out["up"]["z"] / 3


def test_page_all_silent_days_z_zero(spark):
    """A key whose every complete day is all-tied (uniform hourly
    count) sits exactly at the null expectation: z == 0."""
    from tits_spark.operators.friedman import page_trend_hourly

    rows = [
        ("flat", BASE + dt.timedelta(days=d, hours=h))
        for d in range(4)
        for h in range(24)
    ]
    got = page_trend_hourly(
        spark.createDataFrame(rows, "key string, ts timestamp")
    ).collect()[0]
    assert got["z"] == 0.0 and got["l2"] == 7500 * got["n_blocks"]
