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
