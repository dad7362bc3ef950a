"""Histogram (lattice) quantiles vs the direct type-1 definition."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tits_spark.operators.quantiles import hist_quantiles


def type1(sorted_vals, p):
    return sorted_vals[math.ceil(p * len(sorted_vals)) - 1]


def test_matches_type1_definition(spark):
    rng = np.random.default_rng(17)
    data = {
        "a": np.round(rng.normal(50, 20, 500), 2),
        "b": np.round(rng.exponential(10, 77), 2),
        "c": np.array([3.25]),                      # singleton
        "d": np.round(rng.uniform(-5, 5, 40), 2),   # negatives
    }
    rows = [(k, float(v)) for k, arr in data.items() for v in arr]
    df = spark.createDataFrame(rows, "key string, value double")
    out = {
        r["key"]: r
        for r in hist_quantiles(
            df, ["key"], "value", probs=(0.25, 0.5, 0.9, 1.0)
        ).collect()
    }
    for k, arr in data.items():
        s = np.sort(arr)
        assert out[k]["n"] == len(arr)
        for p, col in [(0.25, "q_p25"), (0.5, "q_p50"), (0.9, "q_p90"), (1.0, "q_p100")]:
            assert out[k][col] == pytest.approx(type1(s, p), abs=1e-9), (k, p)


def test_prob_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "key string, value double")
    with pytest.raises(ValueError):
        hist_quantiles(df, ["key"], probs=(0.905,))
    with pytest.raises(ValueError):
        hist_quantiles(df, ["key"], probs=(0.0,))


def test_merge_property(spark):
    # the histogram is mergeable: quantiles over the union equal
    # quantiles computed from the summed per-shard histograms — here
    # exercised end-to-end by splitting the input and unioning
    rng = np.random.default_rng(3)
    vals = np.round(rng.normal(0, 1, 300), 2)
    rows = [("k", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "key string, value double")
    half1 = spark.createDataFrame(rows[:150], "key string, value double")
    half2 = spark.createDataFrame(rows[150:], "key string, value double")
    a = hist_quantiles(df, ["key"]).collect()[0]
    b = hist_quantiles(half1.union(half2), ["key"]).collect()[0]
    assert a.asDict() == b.asDict()


def test_hist_cascade_exact(spark, events):
    from pyspark.sql import functions as F

    from tits_spark.operators.quantiles import (
        hist_cascade,
        quantiles_from_hist,
        value_histogram,
    )

    def at(tier_unit):
        return events.select(
            F.date_trunc(tier_unit, "ts").alias("bucket_ts"), "value"
        )

    h1m = value_histogram(at("minute"), ["bucket_ts"])
    direct_1h = value_histogram(at("hour"), ["bucket_ts"])
    casc_1h = hist_cascade(h1m, "bucket_ts", "1h")
    as_map = lambda df: {(r["bucket_ts"], r["q"]): r["cnt"] for r in df.collect()}
    assert as_map(casc_1h) == as_map(direct_1h)
    # and the derived quantiles agree at the coarser tier too
    qa = {r["bucket_ts"]: r for r in
          quantiles_from_hist(casc_1h, ["bucket_ts"], probs=(0.5, 0.9)).collect()}
    qb = {r["bucket_ts"]: r for r in
          quantiles_from_hist(direct_1h, ["bucket_ts"], probs=(0.5, 0.9)).collect()}
    assert qa == qb and len(qa) > 0
