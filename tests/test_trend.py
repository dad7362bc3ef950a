"""Mann-Kendall + Theil-Sen: kernel vs naive definition, Spark path."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.trend import _median_pinned, mk_numpy, trend_stats


def naive_mk(t, v):
    n = len(v)
    s = sum(
        int(v[j] > v[i]) - int(v[j] < v[i])
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    ties = [c for c in Counter(v).values() if c > 1]
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - sum(c * (c - 1) * (2 * c + 5) for c in ties)
    ) / 18.0
    slopes = sorted(
        (v[j] - v[i]) / (t[j] - t[i])
        for i in range(n) for j in range(i + 1, n) if t[j] != t[i]
    )
    return s, var_s, slopes


def test_kernel_matches_naive():
    rng = np.random.default_rng(4)
    t = np.cumsum(rng.integers(1, 100, 60)).astype(np.float64)
    v = np.round(rng.normal(0, 5, 60), 1)  # 1dp -> guaranteed ties
    s, var_s, z, slope = mk_numpy(t, v)
    ns, nvar, nslopes = naive_mk(list(t), list(v))
    assert s == ns
    assert var_s == nvar
    assert slope == _median_pinned(np.array(nslopes))
    expected_z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )
    assert z == expected_z


def test_known_trends():
    t = np.arange(30, dtype=np.float64)
    up = t * 2.0 + 5.0
    s, _, z, slope = mk_numpy(t, up)
    assert s == 30 * 29 // 2 and z > 1.96
    assert slope == 2.0            # every pairwise slope identical
    s0, _, z0, _ = mk_numpy(t, np.full(30, 7.0))
    assert s0 == 0 and z0 == 0.0


def test_spark_path(spark):
    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(11)
    rows = []
    for k, drift in [("up", 0.5), ("down", -0.5), ("flat", 0.0)]:
        v = np.cumsum(rng.normal(drift, 0.1, 50)) if drift else rng.normal(0, 1, 50)
        rows += [
            (k, t0 + dt.timedelta(seconds=60 * i + int(i % 7)), float(x))
            for i, x in enumerate(v)
        ]
    rows += [("tiny", t0, 1.0)]  # below min_points -> dropped
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {r["key"]: r for r in trend_stats(df).collect()}
    assert set(out) == {"up", "down", "flat"}
    assert out["up"]["trend"] == "inc" and out["up"]["sen_slope"] > 0
    assert out["down"]["trend"] == "dec" and out["down"]["sen_slope"] < 0
    assert out["flat"]["trend"] == "none"
    assert out["up"]["n"] == 50


def test_ols_trend_matches_numpy(spark, events):
    """Exact-integer-moment OLS vs numpy.polyfit on the same rebased
    integer (seconds, cents) data."""
    import numpy as np

    from tits_spark.operators.linreg import ols_trend

    got = (
        ols_trend(
            events.select(F.col("user_id").alias("key"), "ts", "value")
        )
        .toPandas()
        .set_index("key")
    )
    assert len(got) > 0
    pdf = events.select("user_id", "ts", "value").toPandas().dropna(subset=["value"])
    for key, grp in list(pdf.groupby("user_id"))[:12]:
        us = grp["ts"].astype("datetime64[us]").astype(np.int64)
        t = np.floor((us - us.min()) / 1e6).astype(np.int64)
        c = np.rint(grp["value"].to_numpy() * 100.0)
        if len(grp) < 3 or t.var() == 0 or c.var() == 0:
            assert key not in got.index
            continue
        slope, icept = np.polyfit(t, c, 1)
        row = got.loc[key]
        np.testing.assert_allclose(row["slope_per_sec"], slope / 100.0, rtol=1e-8)
        np.testing.assert_allclose(row["intercept"], icept / 100.0, rtol=1e-6)
        r = np.corrcoef(t, c)[0, 1]
        np.testing.assert_allclose(row["r2"], r * r, rtol=1e-8)
        assert 0.0 <= row["r2"] <= 1.0 + 1e-12


def test_ecdf_ranks_bounds_and_ties(spark):
    import pandas as pd

    from tits_spark.operators.cross_section import ecdf_ranks

    df = spark.createDataFrame(
        pd.DataFrame({"key": ["a"] * 5, "value": [1.0, 2.0, 2.0, 3.0, None]}),
        "key string, value double",
    )
    out = ecdf_ranks(df).orderBy("value").toPandas()
    assert len(out) == 4  # null dropped
    assert list(out["pct_rank"]) == [0.0, 1 / 3, 1 / 3, 1.0]
    assert list(out["ecdf"]) == [0.25, 0.75, 0.75, 1.0]
