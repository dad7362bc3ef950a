from __future__ import annotations

import datetime as dt

from tits_spark.operators.event_study import event_study


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, event_type string"
    )


def test_event_study_recovers_planted_shock(spark):
    # flat baseline 10.0; every 'spike' hour carries 50.0 instead;
    # composite must show 50 at rel=0 and 10 elsewhere
    rows = []
    for h in range(60):
        spike = h in (20, 40)
        rows.append(
            (
                "k",
                BASE + dt.timedelta(hours=h),
                50.0 if spike else 10.0,
                "spike" if spike else "noise",
            )
        )
    out = {r.rel: r for r in event_study(_mk(spark, rows), "spike", k=3).collect()}
    assert set(out) == set(range(-3, 4))
    assert out[0].mean_u6 == 50_000_000
    for rel in (-3, -2, -1, 1, 2, 3):
        assert out[rel].mean_u6 == 10_000_000
    assert out[0].n_anchors == 2 and out[0].n_obs == 2


def test_event_study_edge_windows_truncate(spark):
    # single anchor at hour 0: negative offsets have no observations
    rows = [("k", BASE, 5.0, "go")] + [
        ("k", BASE + dt.timedelta(hours=h), 7.0, "x") for h in (1, 2)
    ]
    out = {r.rel: r for r in event_study(_mk(spark, rows), "go", k=2).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].mean_u6 == 5_000_000
    assert out[1].mean_u6 == 7_000_000
