from __future__ import annotations

import datetime as dt

from tits_spark.operators.bursts import burst_intervals


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def test_burst_islands_merge_and_split(spark):
    rows = []
    # baseline: 1 event/hour for 50 hours
    for h in range(50):
        rows.append(("k", BASE + dt.timedelta(hours=h, minutes=5)))
    # burst A: hours 10-11 get 10 events each (consecutive -> one island)
    for h in (10, 11):
        rows += [("k", BASE + dt.timedelta(hours=h, minutes=m)) for m in range(10, 20)]
    # burst B: hour 30 gets 8 events (separate island)
    rows += [("k", BASE + dt.timedelta(hours=30, minutes=m)) for m in range(8)]
    out = sorted(
        burst_intervals(_mk(spark, rows), mult=3, min_count=3).collect(),
        key=lambda r: r.burst_start,
    )
    assert len(out) == 2
    a, b = out
    assert a.n_buckets == 2 and a.n_events == 22 and a.peak == 11
    assert a.burst_start == BASE + dt.timedelta(hours=10)
    assert a.burst_end == BASE + dt.timedelta(hours=11)
    assert b.n_buckets == 1 and b.n_events == 9 and b.peak == 9


def test_uniform_key_has_no_bursts(spark):
    rows = [("u", BASE + dt.timedelta(hours=h)) for h in range(100)]
    assert burst_intervals(_mk(spark, rows)).collect() == []
