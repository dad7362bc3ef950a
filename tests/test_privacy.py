"""k-anonymity report: hand-built class structure, small-class share,
l-diversity floor, planted singleton exposure."""

from __future__ import annotations

import datetime as dt

from tits_spark.operators.privacy import k_anonymity_report

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, user_id string"
    )


def test_k_anonymity_hand_built(spark):
    rows = []
    # class A (click, hour 9, band 0): 6 rows, 3 users
    for i in range(6):
        rows.append(("click", BASE.replace(hour=9), 5.0, f"u{i % 3}"))
    # class B (view, hour 9, band 0): 3 rows, 2 users -> small (< 5)
    for i in range(3):
        rows.append(("view", BASE.replace(hour=9), 4.0, f"u{i % 2}"))
    # class C (click, hour 10, band 1): 1 row, 1 user -> k_min = l_min = 1
    rows.append(("click", BASE.replace(hour=10), 12.0, "u9"))
    r = k_anonymity_report(_ev(spark, rows)).collect()[0]
    assert r["n_rows"] == 10
    assert r["n_classes"] == 3
    assert r["k_min"] == 1
    assert r["k_p50"] == 3  # sizes sorted (1, 3, 6); rank (3+1)//2 = 2
    assert r["rows_small"] == 4  # classes B (3) + C (1)
    assert r["pct_small_ppm"] == 400_000
    assert r["l_min"] == 1


def test_k_anonymity_threshold_and_bands(spark):
    # all rows share one class at band granularity 1000 cents
    rows = [
        ("click", BASE.replace(hour=9), 5.0 + i * 0.01, f"u{i}")
        for i in range(8)
    ]
    r = k_anonymity_report(_ev(spark, rows)).collect()[0]
    assert (r["n_classes"], r["k_min"], r["l_min"]) == (1, 8, 8)
    assert r["rows_small"] == 0 and r["pct_small_ppm"] == 0
    # shrink the band: every row its own class
    r2 = k_anonymity_report(_ev(spark, rows), band_cents=1).collect()[0]
    assert r2["n_classes"] == 8
    assert r2["k_min"] == 1
    assert r2["pct_small_ppm"] == 1_000_000
