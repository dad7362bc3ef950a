"""Kaplan–Meier survival curve: hand cases + invariants on real events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.survival import kaplan_meier

UTC = dt.timezone.utc


def _ts(sec: float) -> dt.datetime:
    # all within one calendar month so hand cases land in one cohort
    return dt.datetime(2024, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=sec)


def _km(spark, rows):
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    return {r.dur_us: r for r in kaplan_meier(df).collect()}


def test_km_textbook_curve(spark):
    # u1 converts at +10s, u2 converts at +20s, u3 censored at +15s,
    # u4 censored at +30s.  Classic staggered risk set:
    #   t=10s: n=4, d=1 -> S = 3/4
    #   t=15s: censor only -> S unchanged, n_risk=3
    #   t=20s: n=2, d=1 -> S = 3/4 * 1/2 = 0.375
    #   t=30s: censor only at the end, n_risk=1
    rows = [
        ("u1", _ts(0), "view"), ("u1", _ts(10), "purchase"),
        ("u2", _ts(0), "view"), ("u2", _ts(20), "purchase"),
        ("u3", _ts(0), "view"), ("u3", _ts(15), "click"),
        ("u4", _ts(0), "view"), ("u4", _ts(30), "click"),
    ]
    out = _km(spark, rows)
    s = 1_000_000  # µs per second
    assert out[10 * s].n_risk == 4 and out[10 * s].d == 1
    assert out[10 * s].survival == pytest.approx(0.75)
    assert out[15 * s].d == 0 and out[15 * s].censored == 1
    assert out[15 * s].survival == pytest.approx(0.75)
    assert out[20 * s].n_risk == 2 and out[20 * s].d == 1
    assert out[20 * s].survival == pytest.approx(0.375)
    assert out[30 * s].n_risk == 1 and out[30 * s].censored == 1
    assert out[30 * s].survival == pytest.approx(0.375)


def test_km_all_fail_pins_zero(spark):
    # everyone converts: the last time point has d = n_risk -> S pinned to
    # exactly 0.0, no ln(0)
    rows = [
        ("u1", _ts(0), "view"), ("u1", _ts(5), "purchase"),
        ("u2", _ts(0), "view"), ("u2", _ts(5), "purchase"),
    ]
    out = _km(spark, rows)
    assert out[5_000_000].survival == 0.0


def test_km_entry_required(spark):
    # a user with no start_event contributes nothing; conversions before
    # entry don't count (failure must be AT OR AFTER first view)
    rows = [
        ("u1", _ts(0), "purchase"), ("u1", _ts(10), "view"),
        ("u1", _ts(25), "purchase"),
        ("u2", _ts(0), "click"), ("u2", _ts(9), "purchase"),  # never views
    ]
    out = _km(spark, rows)
    assert set(out) == {15_000_000}
    assert out[15_000_000].d == 1 and out[15_000_000].n_risk == 1


def test_km_invariants_on_events(spark, events):
    out = kaplan_meier(events).cache()
    try:
        # survival is in [0, 1] and non-increasing within each cohort
        assert out.filter((F.col("survival") < 0) | (F.col("survival") > 1)).count() == 0
        from pyspark.sql import Window

        w = Window.partitionBy("cohort").orderBy("dur_us")
        mono = out.withColumn("_prev", F.lag("survival").over(w)).filter(
            F.col("_prev").isNotNull() & (F.col("survival") > F.col("_prev") + 1e-9)
        )
        assert mono.count() == 0
        # at each cohort's first time point, n_risk equals the cohort's
        # total subjects (sum of d + censored)
        tot = out.groupBy("cohort").agg(
            F.sum(F.col("d") + F.col("censored")).alias("n_subj"),
            F.min_by("n_risk", "dur_us").alias("first_risk"),
        )
        assert tot.filter(F.col("first_risk") != F.col("n_subj")).count() == 0
    finally:
        out.unpersist()
