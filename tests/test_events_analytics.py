"""cohort_retention / funnel: hand cases + invariants on real events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.events_analytics import cohort_retention, funnel, funnel_summary

UTC = dt.timezone.utc
DAY = 86400


def _ts(day: float, sec: float = 0) -> dt.datetime:
    return dt.datetime.fromtimestamp(day * DAY + sec, tz=UTC)


def test_cohort_retention_grid(spark):
    rows = [
        ("u1", _ts(0)), ("u1", _ts(1)), ("u1", _ts(2)),
        ("u2", _ts(0)), ("u2", _ts(2)),
        ("u3", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    out = {(r.cohort_ts.replace(tzinfo=UTC), r.age): r
           for r in cohort_retention(df, bucket_secs=DAY).collect()}
    # cohort day0 = {u1, u2}; day1 = {u3}
    assert out[(_ts(0), 0)].n_active == 2 and out[(_ts(0), 0)].cohort_size == 2
    assert out[(_ts(0), 1)].n_active == 1              # only u1 on day1
    assert out[(_ts(0), 2)].n_active == 2              # u1 and u2 on day2
    assert out[(_ts(1), 0)].n_active == 1 and out[(_ts(1), 0)].cohort_size == 1
    assert out[(_ts(0), 1)].retention == pytest.approx(0.5)
    assert (_ts(1), 1) not in out                      # u3 never returns


def test_cohort_age0_is_full(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts")
    out = cohort_retention(ev, bucket_secs=DAY)
    bad = out.filter((F.col("age") == 0) & (F.col("n_active") != F.col("cohort_size")))
    assert bad.count() == 0
    # n_active never exceeds cohort_size
    assert out.filter(F.col("n_active") > F.col("cohort_size")).count() == 0


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes in order
        ("u1", _ts(0, 10), "view"), ("u1", _ts(0, 20), "click"), ("u1", _ts(0, 30), "purchase"),
        # u2: purchase BEFORE click -> chain breaks at step 3
        ("u2", _ts(0, 10), "view"), ("u2", _ts(0, 30), "click"), ("u2", _ts(0, 20), "purchase"),
        # u3: never viewed -> absent from output
        ("u3", _ts(0, 5), "click"), ("u3", _ts(0, 6), "purchase"),
        # u4: equal timestamps do NOT count (strictly after)
        ("u4", _ts(0, 10), "view"), ("u4", _ts(0, 10), "click"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, event_type string")
    out = {r.key: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {"u1", "u2", "u4"}
    assert out["u1"].steps_completed == 3
    assert out["u2"].steps_completed == 2 and out["u2"].t3 is None
    assert out["u4"].steps_completed == 1 and out["u4"].t2 is None


def test_funnel_greedy_doesnt_miss_completion(spark):
    # first view at t=10; click only at t=5 (before) and t=15 (after);
    # purchase at t=20: greedy from the FIRST view still completes
    rows = [
        ("u1", _ts(0, 10), "view"),
        ("u1", _ts(0, 5), "click"), ("u1", _ts(0, 15), "click"),
        ("u1", _ts(0, 20), "purchase"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, event_type string")
    r = funnel(df, ["view", "click", "purchase"]).collect()[0]
    assert r.steps_completed == 3
    assert r.t2.replace(tzinfo=UTC) == _ts(0, 15)


def test_funnel_summary_monotone(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "event_type")
    s = funnel_summary(ev, ["view", "click", "purchase"]).collect()
    ns = [r.n_users for r in sorted(s, key=lambda r: r.step_idx)]
    assert ns[0] >= ns[1] >= ns[2] >= 0 and ns[0] > 0
    assert sorted(r.conversion for r in s)[-1] == pytest.approx(1.0)


def test_plans_no_cartesian(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "event_type")
    for q in (cohort_retention(ev.select("key", "ts")),
              funnel(ev, ["view", "click", "purchase"])):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------- time_to_event

def test_time_to_event_basic(spark):
    import pandas as pd

    from tits_spark.operators.events_analytics import time_to_event

    pdf = pd.DataFrame({
        "key": ["u"] * 5,
        "ts": pd.to_datetime([
            "2026-01-01 00:00:00",  # view -> converts at 00:10
            "2026-01-01 00:05:00",  # view -> converts at 00:10
            "2026-01-01 00:10:00",  # purchase
            "2026-01-01 00:20:00",  # view -> no later purchase: dropped
            "2026-01-01 00:25:00",  # click: not a source
        ]),
        "event_type": ["view", "view", "purchase", "view", "click"],
        "eid": [1, 2, 3, 4, 5],
    })
    df = spark.createDataFrame(
        pdf, "key string, ts timestamp, event_type string, eid long"
    )
    got = {
        r["ts"].isoformat(): r["latency_us"]
        for r in time_to_event(
            df, "key", "ts", "event_type", "view", "purchase",
            order_tiebreak="eid",
        ).collect()
    }
    assert got == {
        "2026-01-01T00:00:00": 600_000_000,
        "2026-01-01T00:05:00": 300_000_000,
    }


def test_time_to_event_horizon_and_tie(spark):
    import pandas as pd

    from tits_spark.operators.events_analytics import time_to_event

    # purchase at the SAME timestamp as the view: the forward frame is
    # strictly-after in (ts, eid) order, so the view converts to it
    # only via the tiebreak ordering (purchase has the larger eid)
    pdf = pd.DataFrame({
        "key": ["u"] * 3,
        "ts": pd.to_datetime([
            "2026-01-01 00:00:00",
            "2026-01-01 00:00:00",
            "2026-01-02 00:00:00",
        ]),
        "event_type": ["view", "purchase", "purchase"],
        "eid": [1, 2, 3],
    })
    df = spark.createDataFrame(
        pdf, "key string, ts timestamp, event_type string, eid long"
    )
    lat = time_to_event(
        df, "key", "ts", "event_type", "view", "purchase",
        order_tiebreak="eid",
    ).collect()
    assert len(lat) == 1 and lat[0]["latency_us"] == 0
    # horizon cuts the conversion off entirely when only the day-later
    # purchase exists
    df2 = df.where("eid != 2")
    lat2 = time_to_event(
        df2, "key", "ts", "event_type", "view", "purchase",
        order_tiebreak="eid", horizon_sec=3600,
    ).collect()
    assert lat2 == []


def test_latency_summary_counts(spark, events):
    from tits_spark.operators.events_analytics import (
        latency_summary,
        time_to_event,
    )

    lat = time_to_event(
        events.withColumnRenamed("key", "user_id"),
        "user_id", "ts", "event_type", "view", "purchase",
    ) if "event_type" in events.columns else None
    if lat is None:
        return
    s = latency_summary(lat).collect()
    assert all(r["n_conv"] >= 1 and r["p50_us"] <= r["p90_us"] for r in s)


def test_dispersion_index_poisson_near_one(spark):
    """Poisson arrivals -> D ~ 1; fixed-interval arrivals -> D = 0 on
    the non-empty-bucket counts."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.events_analytics import dispersion_index

    rng = np.random.default_rng(5)
    # poisson: exponential gaps, ~4/hour over 600 hours
    gaps = rng.exponential(900.0, 2400)
    ts_p = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.cumsum(gaps), unit="s")
    # metronome: exactly 4/hour
    ts_m = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.arange(2400) * 900.0, unit="s")
    df = spark.createDataFrame(
        pd.concat([
            pd.DataFrame({"key": "poisson", "ts": ts_p}),
            pd.DataFrame({"key": "metronome", "ts": ts_m}),
        ]),
        "key string, ts timestamp",
    )
    out = {r["key"]: r for r in dispersion_index(df, bucket_secs=3600).collect()}
    assert abs(out["poisson"]["dispersion"] - 1.0) < 0.35
    assert out["metronome"]["dispersion"] == 0.0
    assert out["metronome"]["mean_cnt"] == 4.0


def test_source_overlap_identity(spark, docs):
    """Pair counts are symmetric-consistent: containments derive from
    the same n_common, jaccard <= min(containments)."""
    from tits_spark.operators.dedup import source_ngram_overlap

    out = source_ngram_overlap(docs).toPandas()
    assert len(out) > 0
    assert (out["n_common"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert (out["jaccard"] <= out["containment_a"] + 1e-15).all()
    assert (out["jaccard"] <= out["containment_b"] + 1e-15).all()
    assert ((out["jaccard"] > 0) == (out["n_common"] > 0)).all()
