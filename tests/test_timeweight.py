"""time_weighted_avg / counter_rate: hand-built cases + a naive-pandas
property check on real events data."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.timeweight import counter_rate, time_weighted_avg

UTC = dt.timezone.utc


def _ts(sec: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(sec, tz=UTC)


def test_twa_single_bucket(spark):
    # value 10 for 60s then 20 for 40s inside one 1h bucket
    rows = [("a", _ts(0), 10.0), ("a", _ts(60), 20.0), ("a", _ts(100), 99.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = time_weighted_avg(df, bucket_secs=3600).collect()
    assert len(out) == 1
    r = out[0]
    assert r.covered_sec == pytest.approx(100.0)
    assert r.twa == pytest.approx((10 * 60 + 20 * 40) / 100.0)


def test_twa_segment_split_across_buckets(spark):
    # one segment [30, 150) with value 5 over 60s buckets: 30s in bucket
    # 0, 60s in bucket 1, 30s in bucket 2
    rows = [("a", _ts(30), 5.0), ("a", _ts(150), 7.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {r.bucket_ts.replace(tzinfo=UTC): r for r in time_weighted_avg(df, bucket_secs=60).collect()}
    assert set(out) == {_ts(0), _ts(60), _ts(120)}
    assert out[_ts(0)].covered_sec == pytest.approx(30.0)
    assert out[_ts(60)].covered_sec == pytest.approx(60.0)
    assert out[_ts(120)].covered_sec == pytest.approx(30.0)
    for r in out.values():
        assert r.twa == pytest.approx(5.0)


def test_twa_max_gap_clips_stale_carry(spark):
    # 10h gap: unclipped LOCF would cover 10h of buckets; with a 90s
    # horizon only 90s past the observation carries
    rows = [("a", _ts(0), 1.0), ("a", _ts(36000), 2.0), ("a", _ts(36060), 3.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    unclipped = time_weighted_avg(df, bucket_secs=3600)
    clipped = time_weighted_avg(df, bucket_secs=3600, max_gap_sec=90)
    assert unclipped.count() == 11  # buckets 0..9 from the stale carry + bucket 10
    rows_c = {r.bucket_ts.replace(tzinfo=UTC): r for r in clipped.collect()}
    # only bucket 0 (90s of value 1) and bucket 10 (60s of value 2)
    assert set(rows_c) == {_ts(0), _ts(36000)}
    assert rows_c[_ts(0)].covered_sec == pytest.approx(90.0)
    assert rows_c[_ts(36000)].covered_sec == pytest.approx(60.0)


def test_twa_conservation_vs_naive(spark, events):
    """sum(twa * covered) over buckets == exact LOCF integral per key,
    and per-bucket values match a naive pandas recompute."""
    ev = events.filter(F.col("user_id") < 40).select(
        F.col("user_id").alias("key"), "ts", "value"
    )
    out = time_weighted_avg(ev, bucket_secs=3600).toPandas()
    pdf = ev.toPandas().sort_values(["key", "ts", "value"])
    bucket_us = 3600 * 1_000_000
    naive = {}
    for key, g in pdf.groupby("key"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = g["value"].to_numpy()
        for i in range(len(t) - 1):
            s, e = int(t[i]), int(t[i + 1])
            if e <= s:
                continue
            b = s // bucket_us
            while b * bucket_us < e:
                lo = max(s, b * bucket_us)
                hi = min(e, (b + 1) * bucket_us)
                w, ws = naive.get((key, b), (0.0, 0))
                naive[(key, b)] = (w + v[i] * (hi - lo), ws + (hi - lo))
                b += 1
    assert len(out) == len(naive)
    for r in out.itertuples():
        b = int(r.bucket_ts.timestamp()) // 3600
        w, ws = naive[(r.key, b)]
        assert r.covered_sec == pytest.approx(ws / 1e6, rel=1e-12)
        assert r.twa == pytest.approx(w / ws, rel=1e-9)


def test_twa_pre_epoch_floor_bucketing(spark):
    """Pre-1970 segments must land in negative buckets (floor, not
    truncate-toward-zero): a segment [-100s, 50s) over 60s buckets
    covers buckets -2, -1, and 0."""
    rows = [("a", _ts(-100), 3.0), ("a", _ts(50), 9.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {int(r.bucket_ts.timestamp()) // 60: r
           for r in time_weighted_avg(df, bucket_secs=60).collect()}
    assert set(out) == {-2, -1, 0}
    assert out[-2].covered_sec == pytest.approx(40.0)  # [-100, -60) -> 40s
    assert out[-1].covered_sec == pytest.approx(60.0)
    assert out[0].covered_sec == pytest.approx(50.0)
    assert sum(r.covered_sec for r in out.values()) == pytest.approx(150.0)


def test_twa_max_gap_zero_yields_nothing(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(100), 2.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    assert time_weighted_avg(df, bucket_secs=60, max_gap_sec=0).count() == 0


def test_counter_rate_resets(spark):
    # counter 0 -> 10 -> 3 (reset) -> 8 within one bucket
    rows = [
        ("a", _ts(0), 0.0),
        ("a", _ts(10), 10.0),
        ("a", _ts(20), 3.0),
        ("a", _ts(30), 8.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = counter_rate(df, bucket_secs=60).collect()
    assert len(out) == 1
    r = out[0]
    # increases: +10, reset->+3, +5 = 18; first sample contributes 0
    assert r.increase == pytest.approx(18.0)
    assert r.n_resets == 1
    assert r.n_samples == 4
    assert r.rate_per_sec == pytest.approx(18.0 / 60.0)


def test_counter_rate_first_sample_per_bucket_carries_baseline(spark):
    # baseline from the previous bucket still counts: 100 at t=50,
    # 130 at t=70 -> bucket 1 increase is 30
    rows = [("a", _ts(50), 100.0), ("a", _ts(70), 130.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {int(r.bucket_ts.timestamp()) // 60: r for r in counter_rate(df, bucket_secs=60).collect()}
    assert out[0].increase == pytest.approx(0.0)
    assert out[1].increase == pytest.approx(30.0)


def test_counter_rate_vs_naive(spark, events):
    ev = events.filter(F.col("user_id") < 40).select(
        F.col("user_id").alias("key"), "ts", "value"
    )
    out = counter_rate(ev, bucket_secs=3600).toPandas()
    pdf = ev.toPandas().sort_values(["key", "ts", "value"])
    naive = {}
    for key, g in pdf.groupby("key"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = g["value"].to_numpy()
        for i in range(len(t)):
            b = int(t[i]) // (3600 * 1_000_000)
            inc, n, resets = naive.get((key, b), (0.0, 0, 0))
            if i > 0:
                d = v[i] - v[i - 1]
                inc += v[i] if d < 0 else d
                resets += 1 if d < 0 else 0
            naive[(key, b)] = (inc, n + 1, resets)
    assert len(out) == len(naive)
    for r in out.itertuples():
        b = int(r.bucket_ts.timestamp()) // 3600
        inc, n, resets = naive[(r.key, b)]
        assert r.increase == pytest.approx(inc, rel=1e-9, abs=1e-9)
        assert r.n_samples == n
        assert r.n_resets == resets


def test_twa_plan_single_window_shuffle(spark, events):
    """Plan shape: exactly one window (per-key sort) feeding one hash
    aggregate; no cartesian, no Python eval in the plan."""
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    plan = time_weighted_avg(ev, bucket_secs=3600)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Window") == 1
