"""KS two-sample, Wald–Wolfowitz runs, variance ratio, Spearman."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.stat_tests import (
    ks_two_sample,
    runs_test,
    spearman_xcorr,
    variance_ratio,
)


def _series(spark, series):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=60 * i), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


# ------------------------------------------------------------------ KS


def naive_ks(a, b):
    """Brute-force two-sample D = sup |F_a - F_b| over the pooled grid."""
    a, b = np.sort(a), np.sort(b)
    grid = np.concatenate([a, b])
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def test_ks_two_sample_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    a = np.round(rng.normal(10, 2, 200), 2)
    b = np.round(rng.normal(11, 2, 300), 2)
    rows = [("k", float(x), True) for x in a] + [("k", float(x), False) for x in b]
    df = spark.createDataFrame(rows, "key string, value double, is_a boolean")
    row = ks_two_sample(df).collect()[0]
    assert row["n_a"] == 200 and row["n_b"] == 300
    d = naive_ks(a, b)
    assert row["d_num"] == round(d * 200 * 300)
    assert row["ks_d"] == pytest.approx(d, abs=1e-6)


def test_ks_identical_samples_zero(spark):
    vals = [1.0, 2.0, 2.0, 3.0]
    rows = [("k", v, True) for v in vals] + [("k", v, False) for v in vals]
    df = spark.createDataFrame(rows, "key string, value double, is_a boolean")
    row = ks_two_sample(df).collect()[0]
    assert row["d_num"] == 0 and row["ks_d"] == 0.0


# ---------------------------------------------------------------- runs


def test_runs_alternating_is_max_runs(spark):
    # strict alternation around the median -> R = n (every step changes)
    v = [0.0, 10.0] * 50
    df = _series(spark, {"alt": v})
    row = runs_test(df).collect()[0]
    assert row["n_above"] == 50 and row["n_below"] == 50
    assert row["n_runs"] == 100
    # mu = 51, var = 2*50*50*(5000-100)/(100^2*99)
    mu = 1 + 2 * 50 * 50 / 100
    var = 2 * 50 * 50 * (2 * 50 * 50 - 100) / (100 * 100 * 99)
    assert row["z"] == pytest.approx(round((100 - mu) / var**0.5, 6), abs=1e-9)
    assert row["z"] > 9  # far more runs than random


def test_runs_blocked_is_two_runs(spark):
    v = [0.0] * 50 + [10.0] * 50
    row = runs_test(_series(spark, {"blk": v})).collect()[0]
    assert row["n_runs"] == 2 and row["z"] < -9


def test_runs_median_ties_dropped(spark):
    # median = 2.0 exactly (odd count); the two 2.0 rows drop
    v = [1.0, 2.0, 3.0, 2.0, 1.0]
    row = runs_test(_series(spark, {"t": v})).collect()[0]
    assert row["n_above"] == 1 and row["n_below"] == 2
    assert row["n_runs"] == 3  # below(1.0), above(3.0), below(1.0)


# ------------------------------------------------------------------ VR


def test_variance_ratio_random_walk_near_one(spark):
    rng = np.random.default_rng(11)
    walk = np.round(np.cumsum(rng.normal(0, 1, 4000)), 2)
    row = variance_ratio(_series(spark, {"w": walk}), q=4).collect()[0]
    assert row["n_1"] == 3999 and row["n_q"] == 3996
    assert 0.85 < row["vr"] < 1.15


def test_variance_ratio_mean_reverting_below_one(spark):
    # strongly anti-persistent: white noise LEVELS (diffs anti-correlate)
    rng = np.random.default_rng(12)
    lvl = np.round(rng.normal(0, 1, 2000), 2)
    row = variance_ratio(_series(spark, {"m": lvl}), q=4).collect()[0]
    assert row["vr"] < 0.5


def test_variance_ratio_trending_above_one(spark):
    # positively autocorrelated increments (4-step MA of noise) -> VR > 1
    rng = np.random.default_rng(13)
    incr = np.convolve(rng.normal(0, 1, 1003), np.ones(4), mode="valid")
    walk = np.round(np.cumsum(incr), 2)
    row = variance_ratio(_series(spark, {"t": walk}), q=4).collect()[0]
    assert row["vr"] > 2.0


# ------------------------------------------------------------- Spearman


def test_spearman_monotone_is_one(spark):
    rows = [("k", float(i), float(i * i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "key string, a double, b double")
    row = spearman_xcorr(df).collect()[0]
    assert row["n"] == 49 and row["rho"] == 1.0


def test_spearman_reversed_is_minus_one(spark):
    rows = [("k", float(i), float(-i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "key string, a double, b double")
    assert spearman_xcorr(df).collect()[0]["rho"] == -1.0


def test_spearman_ties_average_ranks(spark):
    # scipy-free golden: hand-computed average-rank Spearman
    a = [1.0, 1.0, 2.0, 3.0]
    b = [10.0, 20.0, 20.0, 30.0]
    rows = [("k", x, y) for x, y in zip(a, b)]
    df = spark.createDataFrame(rows, "key string, a double, b double")
    # avg ranks a: 1.5 1.5 3 4 ; b: 1 2.5 2.5 4
    ra = np.array([1.5, 1.5, 3, 4])
    rb = np.array([1.0, 2.5, 2.5, 4])
    rho = np.corrcoef(ra, rb)[0, 1]
    assert spearman_xcorr(df).collect()[0]["rho"] == pytest.approx(
        round(rho, 6), abs=1e-9
    )


def test_spearman_constant_series_null(spark):
    rows = [("k", 1.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, a double, b double")
    assert spearman_xcorr(df).collect()[0]["rho"] is None


# ------------------------------------------------------------- plans


def test_stat_tests_plans_have_no_cartesian_or_udf(spark):
    rng = np.random.default_rng(3)
    df = _series(spark, {"k": np.round(rng.normal(0, 1, 64), 2)})
    for frame in (
        runs_test(df),
        variance_ratio(df),
        ks_two_sample(
            df.select("key", "value", (F.col("value") > 0).alias("is_a"))
        ),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
