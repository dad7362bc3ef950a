from __future__ import annotations

import datetime as dt

from tits_spark.operators.rate_limit import rate_limit_replay


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, eid long, ts timestamp")


def test_burst_drops_after_capacity(spark):
    # capacity 2, 1 token/hour, 5 events 1s apart: first two admitted,
    # the rest see an (almost) empty bucket
    rows = [("k", i, BASE + dt.timedelta(seconds=i)) for i in range(5)]
    out = sorted(
        rate_limit_replay(_mk(spark, rows), capacity=2, rate_per_hour=1).collect(),
        key=lambda r: r.eid,
    )
    assert [r.admitted for r in out] == [True, True, False, False, False]
    # refill while throttled: 277 ut per second gap accumulates; by
    # event 2 (t=2s) two refills have landed
    assert out[2].tokens_ut == 2 * ((1 * 1_000_000) // 3600)
    assert all(r.tokens_ut < 1_000_000 for r in out[2:])


def test_refill_readmits_after_wait(spark):
    rows = [
        ("k", 0, BASE),
        ("k", 1, BASE + dt.timedelta(seconds=1)),
        ("k", 2, BASE + dt.timedelta(seconds=2)),   # dropped
        ("k", 3, BASE + dt.timedelta(hours=2)),     # bucket refilled
    ]
    out = {r.eid: r for r in rate_limit_replay(_mk(spark, rows)).collect()}
    assert out[2].admitted is False
    assert out[3].admitted is True


def test_partitioning_invariance(spark):
    rows = [
        (f"u{j}", j * 100 + i, BASE + dt.timedelta(seconds=7 * i))
        for j in range(5)
        for i in range(30)
    ]
    df = _mk(spark, rows)
    a = sorted(map(tuple, rate_limit_replay(df).collect()))
    b = sorted(map(tuple, rate_limit_replay(df.repartition(11)).collect()))
    assert a == b
