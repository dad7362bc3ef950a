"""Sessionization + time-decayed EWMA over irregular streams."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.sessionize import (
    ewma_irregular,
    session_stats,
    sessionize,
)


def _stream(spark, rows):
    df = spark.createDataFrame(rows, "key string, tsec double, value double")
    return df.select(
        "key", F.timestamp_seconds(F.col("tsec") + 1_700_000_000).alias("ts"), "value"
    )


def test_sessionize_splits_on_gaps(spark):
    # key a: events at 0, 10, 20, then a 1-hour gap, then 3620, 3630
    rows = [("a", float(t), 1.0) for t in (0, 10, 20, 3620, 3630)]
    rows += [("b", 0.0, 1.0)]  # single-event key: one session
    out = sessionize(_stream(spark, rows), gap_seconds=1800.0)
    got = {
        (r["key"], int(r["ts"].timestamp() - 1_700_000_000)): r["session_idx"]
        for r in out.collect()
    }
    assert got == {
        ("a", 0): 1, ("a", 10): 1, ("a", 20): 1,
        ("a", 3620): 2, ("a", 3630): 2,
        ("b", 0): 1,
    }


def test_session_stats(spark):
    rows = [("a", float(t), float(v)) for t, v in ((0, 1), (10, 2), (4000, 5))]
    out = session_stats(_stream(spark, rows), gap_seconds=1800.0).collect()
    by_idx = {r["session_idx"]: r for r in out}
    assert by_idx[1]["n_events"] == 2 and by_idx[1]["v_sum"] == 3.0
    assert by_idx[1]["duration_s"] == 10.0
    assert by_idx[2]["n_events"] == 1 and by_idx[2]["duration_s"] == 0.0


def test_ewma_matches_naive_quadratic(spark):
    """The O(n) prefix-sum factorization equals the O(n^2) definition
    sum_j v_j e^{-(t_i-t_j)/tau} / sum_j e^{-(t_i-t_j)/tau}."""
    rng = np.random.default_rng(11)
    # millisecond grid: timestamps survive the µs-precision timestamp
    # column exactly, so numpy and Spark see identical t
    t = np.sort(np.round(rng.uniform(0, 5000, 60), 3))
    v = rng.normal(0, 1, 60)
    tau = 900.0
    rows = [("k", float(ti), float(vi)) for ti, vi in zip(t, v)]
    out = (
        ewma_irregular(_stream(spark, rows), tau_seconds=tau)
        .orderBy("ts")
        .collect()
    )
    got = np.array([r["ewma"] for r in out])
    want = np.empty(60)
    for i in range(60):
        w = np.exp(-(t[i] - t[: i + 1]) / tau)
        want[i] = (v[: i + 1] * w).sum() / w.sum()
    # the factored prefix-sum form accumulates in a different order
    # than the naive quadratic; observed max relative gap ~3e-9
    assert np.allclose(got, want, rtol=1e-7, atol=1e-12)


def test_ewma_weights_recent_more(spark):
    # step series: after the jump, ewma moves toward the new level and
    # ends between the old and new values, closer to new
    rows = [("k", float(i * 60), 0.0) for i in range(50)]
    rows += [("k", float(3000 + i * 60), 10.0) for i in range(50)]
    out = ewma_irregular(_stream(spark, rows), tau_seconds=600.0).orderBy("ts").collect()
    last = out[-1]["ewma"]
    assert 5.0 < last < 10.0
    assert math.isclose(out[0]["ewma"], 0.0, abs_tol=1e-12)


def test_native_session_window_agrees_with_window_algebra(spark, events):
    """Two independent algorithms — lag+running-sum vs Catalyst's
    session_window interval merge — must produce identical sessions on
    the real irregular events table."""
    from pyspark.sql import functions as F2

    ev = events.select(
        F2.col("user_id").cast("string").alias("key"),
        F2.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    a = session_stats(ev, gap_seconds=1800.0).select(
        "key", "n_events", "start_ts", "end_ts",
        F2.round("duration_s", 6).alias("duration_s"),
        F2.round("v_sum", 4).alias("v_sum"),
    )
    from tits_spark.operators.sessionize import session_stats_native

    b = session_stats_native(ev, gap_seconds=1800.0).select(
        "key", "n_events", "start_ts", "end_ts",
        F2.round("duration_s", 6).alias("duration_s"),
        F2.round("v_sum", 4).alias("v_sum"),
    )
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_ewma_long_span_no_overflow(spark):
    """span/tau >= 1e5: the single-rebase factoring overflows double exp
    (exp(1e5) = inf -> NaN); the segmented rebase must match the naive
    O(n^2) definition computed with bounded exponents."""
    import numpy as np

    rng = np.random.default_rng(42)
    tau = 3600.0  # 1h tau over a ~12-year span -> span/tau ~ 1e5
    n = 400
    t = np.sort(rng.uniform(0, 1e5 * tau, n))
    t = np.floor(t * 1e6) / 1e6  # timestamp columns carry microseconds
    v = rng.normal(0.0, 5.0, n)
    rows = [
        ("k", float(ti), float(vi)) for ti, vi in zip(t, v)
    ]
    df = spark.createDataFrame(rows, "key string, tsec double, value double")
    df = df.withColumn("ts", F.timestamp_seconds("tsec")).drop("tsec")
    out = (
        ewma_irregular(df, tau_seconds=tau)
        .orderBy("ts")
        .select("ewma")
        .collect()
    )
    got = np.array([r["ewma"] for r in out])
    assert np.isfinite(got).all()
    # naive definition with bounded exponents: weights e^{-(ti-tj)/tau}
    want = np.empty(n)
    for i in range(n):
        w = np.exp(-(t[i] - t[: i + 1]) / tau)
        want[i] = float(np.sum(v[: i + 1] * w) / np.sum(w))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)


def test_ewma_chunked_matches_single_rebase_small_span(spark):
    """On spans far below the overflow bound the segmented rebase must
    reproduce the plain factored prefix-sum formulation (~1e-12)."""
    import numpy as np

    rng = np.random.default_rng(7)
    tau = 86400.0
    n = 300
    t = np.sort(rng.uniform(0, 30 * 86400.0, n))  # 30-day span, tau=1d
    v = rng.normal(2.0, 3.0, n)
    df = spark.createDataFrame(
        [("k", float(ti), float(vi)) for ti, vi in zip(t, v)],
        "key string, tsec double, value double",
    ).withColumn("ts", F.timestamp_seconds("tsec")).drop("tsec")
    got = np.array([
        r["ewma"]
        for r in ewma_irregular(df, tau_seconds=tau).orderBy("ts").select("ewma").collect()
    ])
    # plain single-rebase reference computed in numpy
    trel = t - t[0]
    g = np.exp(trel / tau)
    want = np.cumsum(v * g) / np.cumsum(g)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)
