"""Kendall's W: the chi2 = n(k-1)W identity against friedman on the
same exact lattice, perfect-concordance plant, all-tied gate."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.friedman import friedman_weekday, kendall_w_weekday

# epoch-day 19726 % 7 == 0: aligned to the operator's epoch-week blocks
BASE = dt.datetime(2024, 1, 4)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _rows(key, week_counts):
    """week_counts: list of 7-int lists (daily counts, full weeks)."""
    rows = []
    for w, days in enumerate(week_counts):
        for d, c in enumerate(days):
            for i in range(c):
                rows.append(
                    (key, BASE + dt.timedelta(days=7 * w + d, minutes=i))
                )
    return rows


def test_w_identity_and_concordance(spark):
    rng = np.random.default_rng(2403)
    rows = []
    # perfectly concordant: every week ranks days identically
    shape = [1, 2, 3, 4, 5, 6, 7]
    rows += _rows("perfect", [[c * (w + 1) for c in shape] for w in range(4)])
    # noise key
    rows += _rows(
        "noise",
        [[int(x) for x in rng.integers(1, 9, 7)] for _ in range(5)],
    )
    df = _df(spark, rows)
    fw = {r["key"]: r for r in friedman_weekday(df, key="key").collect()}
    kw = {r["key"]: r for r in kendall_w_weekday(df, key="key").collect()}
    assert abs(kw["perfect"]["kendall_w"] - 1.0) < 1e-9
    for k in fw:
        n = fw[k]["n_blocks"]
        assert fw[k]["num"] == kw[k]["num"] and fw[k]["a4"] == kw[k]["a4"]
        # chi2 = n (k-1) W to rounding grain
        assert abs(fw[k]["chi2"] - n * 6 * kw[k]["kendall_w"]) < 2e-5 * n * 6
    assert kw["noise"]["kendall_w"] < 0.6


def test_w_all_tied_is_null(spark):
    rows = _rows("flat", [[3] * 7 for _ in range(3)])
    r = kendall_w_weekday(_df(spark, rows), key="key").collect()[0]
    assert r["kendall_w"] is None
