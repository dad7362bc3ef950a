from __future__ import annotations

import datetime as dt

from tits_spark.operators.naive_backtest import naive_backtest


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_seasonal_key_beats_persistence(spark):
    # strong 24h cycle: value = hour-of-day; seasonal naive is perfect
    # (error 0), persistence is off by 1.0 every hour
    rows = [
        ("s", BASE + dt.timedelta(hours=h), float(h % 24)) for h in range(24 * 10)
    ]
    out = {r.key: r for r in naive_backtest(_mk(spark, rows)).collect()}
    s = out["s"]
    assert s.sae_seas == 0 and s.mase_u6 == 0
    assert s.n_pers == 24 * 10 - 1 and s.n_seas == 24 * 10 - 24
    # persistence err: 1.0 per step except the 23->0 wrap (23.0)
    assert s.sae_pers == (239 - 9) * 100 * 10000 + 9 * 2300 * 10000


def test_trending_key_prefers_persistence(spark):
    # pure linear trend: persistence err = slope, seasonal err = 24*slope
    rows = [
        ("t", BASE + dt.timedelta(hours=h), float(h)) for h in range(24 * 5)
    ]
    out = naive_backtest(_mk(spark, rows)).collect()[0]
    assert out.mase_u6 == 24_000_000  # exactly 24x worse


def test_gap_bins_produce_no_error_rows(spark):
    # two observations 48h apart: no adjacent bins, no 24h-lag bins
    # with both endpoints... (b and b+24 exist only for the pair at
    # lag 48 -> neither forecaster evaluates; key absent)
    rows = [("g", BASE, 1.0), ("g", BASE + dt.timedelta(hours=48), 2.0)]
    assert naive_backtest(_mk(spark, rows)).collect() == []
