from __future__ import annotations

import datetime as dt

from tits_spark.operators.staleness import staleness_report


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def test_staleness_exact_accounting(spark):
    # gaps: 1h, 20h (8h over the 12h SLA), 2h, 36h (24h over)
    offs = [0, 1, 21, 23, 59]
    rows = [("k", BASE + dt.timedelta(hours=h)) for h in offs]
    out = staleness_report(_mk(spark, rows), sla_s=12 * 3600).collect()[0]
    assert out.n_obs == 5
    assert out.span_us == 59 * 3600 * 1_000_000
    assert out.n_violations == 2
    assert out.stale_us == (8 + 24) * 3600 * 1_000_000
    assert out.stale_ppm == int((32 / 59) * 1e6)


def test_always_fresh_key_reports_zero(spark):
    rows = [("f", BASE + dt.timedelta(hours=h)) for h in range(30)]
    out = staleness_report(_mk(spark, rows), sla_s=7200).collect()[0]
    assert out.n_violations == 0 and out.stale_us == 0 and out.stale_ppm == 0


def test_single_observation_key_absent(spark):
    assert staleness_report(_mk(spark, [("x", BASE)])).collect() == []
