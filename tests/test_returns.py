"""Log returns + realized-vol continuous aggregate, Pettitt changepoint,
cross-sectional ranks, and the calendar rollup tier."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.changepoint import cusum_changepoint, pettitt_changepoint
from tits_spark.operators.cross_section import cross_rank
from tits_spark.operators.returns import (
    log_returns,
    realized_vol,
    realized_vol_cascade,
    with_vol,
)
from tits_spark.operators.rollup import rollup_all_tiers, rollup_calendar


# ----------------------------------------------------------- log returns / RV

def _series(spark, seed=7, n_keys=5, n=400):
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2026-03-01")
    for k in range(n_keys):
        ts = base + pd.to_timedelta(
            np.cumsum(rng.integers(1, 900, n)), unit="s"
        )
        v = np.exp(np.cumsum(rng.normal(0, 0.02, n))) * 100
        # sprinkle non-positive prints that must be dropped pre-lag
        bad = rng.choice(n, 5, replace=False)
        v = v.copy()
        v[bad] = [0.0, -1.0, 0.0, -3.5, 0.0]
        rows.append(pd.DataFrame({"key": k, "ts": ts, "value": v}))
    pdf = pd.concat(rows, ignore_index=True)
    return spark.createDataFrame(pdf, "key long, ts timestamp, value double"), pdf


def test_log_returns_match_pandas(spark):
    df, pdf = _series(spark)
    got = (
        log_returns(df).toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    pos = pdf[pdf["value"] > 0].sort_values(["key", "ts"])
    want = pos.assign(
        prev_value=pos.groupby("key")["value"].shift(1)
    ).dropna(subset=["prev_value"])
    want["log_ret"] = np.log(want["value"].to_numpy() / want["prev_value"].to_numpy())
    want = want.reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["prev_value"], want["prev_value"])
    np.testing.assert_allclose(got["log_ret"], want["log_ret"], rtol=0, atol=1e-15)


def test_realized_vol_cascade_equals_direct(spark):
    """1m -> 1h -> 1d merge must equal direct-from-returns at each tier
    (pure sums/min/max, so exact equality, not approximate)."""
    df, _ = _series(spark)
    rets = log_returns(df)
    rv1m = realized_vol(rets, "1m")
    for tier in ("1h", "1d"):
        direct = realized_vol(rets, tier).toPandas()
        cascaded = realized_vol_cascade(rv1m, tier).toPandas()
        d = direct.sort_values(["key", "bucket_ts"]).reset_index(drop=True)
        c = cascaded.sort_values(["key", "bucket_ts"]).reset_index(drop=True)
        assert len(d) == len(c)
        np.testing.assert_array_equal(d["n_ret"], c["n_ret"])
        np.testing.assert_allclose(d["rv"], c["rv"], rtol=1e-12)
        np.testing.assert_array_equal(d["r_min"], c["r_min"])
        np.testing.assert_array_equal(d["r_max"], c["r_max"])


def test_with_vol_sqrt(spark):
    df, _ = _series(spark)
    out = with_vol(realized_vol(log_returns(df), "1d")).toPandas()
    np.testing.assert_allclose(out["rvol"], np.sqrt(out["rv"]), rtol=0)


# ------------------------------------------------------------------- Pettitt

def _shifted(spark, seed=11, n=120, cp=70, delta=3.0, outliers=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1, n)
    v[cp:] += delta
    if outliers:
        v[rng.choice(cp, outliers, replace=False)] += 40.0
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n) * 60, unit="s")
    pdf = pd.DataFrame({"key": 1, "ts": ts, "value": v})
    return spark.createDataFrame(pdf, "key long, ts timestamp, value double")


def _pettitt_naive(v: np.ndarray) -> tuple[int, int]:
    n = len(v)
    best_k, best_t = -1, -1
    for t in range(1, n):
        u = int(np.sign(v[:t, None] - v[None, t:]).sum())
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    return best_k, best_t


def test_pettitt_matches_naive_o_n2(spark):
    df = _shifted(spark, n=60, cp=33, delta=1.5)
    got = pettitt_changepoint(df).toPandas().iloc[0]
    v = df.toPandas().sort_values("ts")["value"].to_numpy()
    k, t = _pettitt_naive(v)
    assert int(got["k_stat"]) == k
    assert int(got["cp_idx"]) == t


def test_pettitt_matches_naive_with_ties(spark):
    """Tie-averaged midranks: quantized values force heavy ties."""
    rng = np.random.default_rng(5)
    v = np.round(rng.normal(0, 1, 80), 0)
    v[40:] += 2
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(80), unit="m")
    df = spark.createDataFrame(
        pd.DataFrame({"key": 1, "ts": ts, "value": v}),
        "key long, ts timestamp, value double",
    )
    got = pettitt_changepoint(df).toPandas().iloc[0]
    k, t = _pettitt_naive(v)
    assert int(got["k_stat"]) == k
    assert int(got["cp_idx"]) == t


def test_pettitt_robust_where_cusum_is_not(spark):
    """A few huge outliers before the true break: rank statistic keeps
    the changepoint; that's the reason this operator exists next to
    CUSUM."""
    df = _shifted(spark, n=120, cp=70, delta=3.0, outliers=3)
    p = pettitt_changepoint(df).toPandas().iloc[0]
    assert abs(int(p["cp_idx"]) - 70) <= 2
    c = cusum_changepoint(df).toPandas().iloc[0]
    # document the contrast (outliers drag the CUSUM split off target);
    # if CUSUM ever matches too this assert is the one to relax
    assert abs(int(c["cp_idx"]) - 70) > 2


def test_pettitt_min_points_and_short_series(spark):
    df = _shifted(spark, n=5, cp=3)
    assert pettitt_changepoint(df, min_points=8).count() == 0


# ---------------------------------------------------------------- cross_rank

def test_cross_rank_small_exact(spark):
    rows = [
        (1, "2026-01-01 10:05:00", 5.0),
        (1, "2026-01-01 10:35:00", 5.0),
        (2, "2026-01-01 10:10:00", 30.0),
        (3, "2026-01-01 10:20:00", 10.0),
        (2, "2026-01-01 11:10:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "key long, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = cross_rank(df, tier="1h").toPandas().sort_values(["bucket_ts", "rnk"])
    hour1 = out[out["bucket_ts"] == pd.Timestamp("2026-01-01 10:00:00")]
    assert list(hour1["key"]) == [2, 1, 3]  # 30 > 10(sum of 5+5) -> tie? no: 30, 10, 10
    # keys 1 and 3 both total 10.0 -> tie broken by key asc
    assert list(hour1["rnk"]) == [1, 2, 3]
    np.testing.assert_allclose(hour1["pct_rank"], [0.0, 0.5, 1.0])
    hour2 = out[out["bucket_ts"] == pd.Timestamp("2026-01-01 11:00:00")]
    assert list(hour2["n_keys"]) == [1]
    assert list(hour2["pct_rank"]) == [0.0]


def test_cross_rank_partitioning_invariant(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    a = cross_rank(ev, tier="1h").toPandas()
    b = cross_rank(ev.repartition(37), tier="1h").toPandas()
    a = a.sort_values(["bucket_ts", "rnk"]).reset_index(drop=True)
    b = b.sort_values(["bucket_ts", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------ calendar tiers

def test_rollup_calendar_matches_direct(spark, events):
    from tits_spark.operators.rollup import rollup_from_raw

    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    day = rollup_all_tiers(ev, "key", "ts", "value")["1d"]
    for unit in ("week", "month"):
        cascaded = rollup_calendar(day, unit).toPandas()
        direct = (
            ev.groupBy("key", F.date_trunc(unit, "ts").alias("bucket_ts"))
            .agg(
                F.count("value").alias("n_obs"),
                F.min("value").alias("v_min"),
                F.max("value").alias("v_max"),
                F.min_by("value", "ts").alias("v_first"),
                F.max_by("value", "ts").alias("v_last"),
            )
            .toPandas()
        )
        c = cascaded.sort_values(["key", "bucket_ts"]).reset_index(drop=True)
        d = direct.sort_values(["key", "bucket_ts"]).reset_index(drop=True)
        assert len(c) == len(d)
        for col in ("n_obs", "v_min", "v_max", "v_first", "v_last"):
            np.testing.assert_array_equal(c[col], d[col])


def test_rollup_calendar_rejects_unknown_unit(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    day = rollup_all_tiers(ev, "key", "ts", "value")["1d"]
    with pytest.raises(ValueError, match="unit"):
        rollup_calendar(day, "fortnight")


def test_pettitt_fuzz_vs_naive(spark):
    """40 random series in ONE dataframe (mixed lengths, heavy-tie
    integer series, constant series) — every k_stat/cp_idx must equal
    the O(n^2) sign-sum definition."""
    rng = np.random.default_rng(2027)
    frames, truth = [], {}
    base = pd.Timestamp("2026-01-01")
    for k in range(40):
        n = int(rng.integers(8, 80))
        style = k % 4
        if style == 0:
            v = rng.normal(0, 1, n)
        elif style == 1:
            v = np.round(rng.normal(0, 1, n), 0)      # heavy ties
        elif style == 2:
            v = np.full(n, 7.0)                        # constant
        else:
            v = rng.normal(0, 1, n)
            v[n // 2:] += rng.uniform(0.5, 3.0)        # planted shift
        ts = base + pd.to_timedelta(np.arange(n), unit="m")
        frames.append(pd.DataFrame({"key": k, "ts": ts, "value": v}))
        truth[k] = _pettitt_naive(v)
    df = spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        "key long, ts timestamp, value double",
    )
    got = pettitt_changepoint(df).toPandas().set_index("key")
    assert len(got) == 40
    for k, (want_k, want_t) in truth.items():
        assert int(got.loc[k, "k_stat"]) == want_k, k
        assert int(got.loc[k, "cp_idx"]) == want_t, k


# ------------------------------------------------------------ holt backtest

def test_holt_backtest_matches_manual(spark):
    """Errors recomputed by hand from the smoothed states."""
    from tits_spark.operators.smoothing import holt_backtest, holt_by_key

    rng = np.random.default_rng(3)
    n = 50
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n), unit="h")
    v = np.cumsum(rng.normal(0.5, 1.0, n)) + 100
    pdf = pd.DataFrame({"key": "a", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    sm = holt_by_key(df, alpha=0.5, beta=0.3)
    out = holt_backtest(sm, df).collect()[0]

    smp = sm.toPandas().sort_values("ts").reset_index(drop=True)
    yhat = (smp["level"] + smp["trend"]).shift(1).to_numpy()
    err = v - yhat
    err = err[2:]  # skip_first=2
    assert out["n_eval"] == n - 2
    np.testing.assert_allclose(out["mae"], round(np.abs(err).mean(), 6), atol=2e-6)
    np.testing.assert_allclose(out["rmse"], round(np.sqrt((err**2).mean()), 6), atol=2e-6)
    np.testing.assert_allclose(out["bias"], round(err.mean(), 6), atol=2e-6)


# --------------------------------------------------------------------- Mood

def _mood_naive_np(v: np.ndarray) -> tuple[int, float]:
    """Direct definition: midranks -> squared centered -> prefix z."""
    n = len(v)
    sorted_v = np.sort(v, kind="stable")
    import collections
    first = {}
    cnt = collections.Counter(v.tolist())
    sr = 1
    for x in sorted_v:
        if x not in first:
            first[x] = sr
        sr += 1
    c = np.array([2 * first[x] + cnt[x] - 1 - (n + 1) for x in v], dtype=np.int64)
    m = c * c
    sm, sm2 = m.sum(), (m * m).sum()
    mean_m = sm / n
    popvar = sm2 / n - mean_m * mean_m
    best = (-1.0, -1, 0.0)
    for t in range(1, n):
        vt = t * (n - t) / (n - 1) * popvar
        z = (m[:t].sum() - t * mean_m) / np.sqrt(vt)
        if abs(z) > best[0]:
            best = (abs(z), t, z)
    return best[1], best[2]


def test_mood_recovers_planted_variance_shift(spark):
    rng = np.random.default_rng(21)
    v = np.concatenate([rng.normal(10, 0.5, 60), rng.normal(10, 4.0, 60)])
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(120), unit="m")
    df = spark.createDataFrame(
        pd.DataFrame({"key": 1, "ts": ts, "value": v}),
        "key long, ts timestamp, value double",
    )
    from tits_spark.operators.changepoint import mood_changepoint

    got = mood_changepoint(df).toPandas().iloc[0]
    assert abs(int(got["cp_idx"]) - 60) <= 3
    assert got["z"] < 0  # prefix less dispersed -> variance increased


def test_mood_fuzz_vs_naive(spark):
    rng = np.random.default_rng(2028)
    frames, truth = [], {}
    base = pd.Timestamp("2026-01-01")
    for k in range(25):
        n = int(rng.integers(10, 60))
        v = rng.normal(0, 1, n)
        if k % 3 == 0:
            v = np.round(v, 0)                    # heavy ties
        if k % 2 == 0:
            v[n // 2:] *= rng.uniform(2.0, 5.0)   # planted scale shift
        ts = base + pd.to_timedelta(np.arange(n), unit="m")
        frames.append(pd.DataFrame({"key": k, "ts": ts, "value": v}))
        truth[k] = _mood_naive_np(v)
    from tits_spark.operators.changepoint import mood_changepoint

    df = spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        "key long, ts timestamp, value double",
    )
    got = mood_changepoint(df).toPandas().set_index("key")
    assert len(got) == 25
    for k, (want_t, want_z) in truth.items():
        assert int(got.loc[k, "cp_idx"]) == want_t, k
        np.testing.assert_allclose(got.loc[k, "z"], want_z, atol=2e-6)


def test_mood_constant_series_dropped(spark):
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(20), unit="m")
    df = spark.createDataFrame(
        pd.DataFrame({"key": 1, "ts": ts, "value": 5.0}),
        "key long, ts timestamp, value double",
    )
    from tits_spark.operators.changepoint import mood_changepoint

    assert mood_changepoint(df).count() == 0


def test_mood_oversized_key_fails_loudly(spark):
    """Keys past the decimal(38,0) exactness bound must RAISE, not
    silently wrap the moment sums (ADVICE r3)."""
    from pyspark.errors import SparkRuntimeException

    from tits_spark.operators.changepoint import mood_changepoint

    df = spark.range(1_300_100).select(
        F.lit("k").alias("key"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    with pytest.raises(SparkRuntimeException, match="exactness bound"):
        mood_changepoint(df).count()
