"""LTTB downsampling: naive-reference parity + shape properties."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.lttb import lttb, lttb_numpy

UTC = dt.timezone.utc


def naive_lttb(t, v, n_out):
    """Independent straight-from-the-paper implementation (scalar loop)."""
    n = len(t)
    if n_out >= n:
        return list(range(n))
    t = [(x - t[0]) for x in t]
    sel = [0]
    nb = n_out - 2
    edges = [1 + (n - 2) * i // nb for i in range(nb + 1)]
    for b in range(nb):
        lo, hi = edges[b], edges[b + 1]
        if b + 1 < nb:
            nlo, nhi = edges[b + 1], edges[b + 2]
        else:
            nlo, nhi = n - 1, n
        cx = sum(t[nlo:nhi]) / (nhi - nlo)
        cy = sum(v[nlo:nhi]) / (nhi - nlo)
        ax, ay = t[sel[-1]], v[sel[-1]]
        best, best_area = lo, -1.0
        for p in range(lo, hi):
            area = abs((ax - cx) * (v[p] - ay) - (ax - t[p]) * (cy - ay))
            if area > best_area:
                best, best_area = p, area
        sel.append(best)
    sel.append(n - 1)
    return sel


def test_lttb_numpy_matches_naive_random():
    rng = np.random.default_rng(11)
    for n, n_out in [(50, 5), (200, 10), (1000, 30), (17, 17), (10, 3)]:
        t = np.sort(rng.uniform(0, 1000, n))
        v = rng.normal(50, 20, n)
        got = lttb_numpy(t, v, n_out)
        want = naive_lttb(list(t), list(v), n_out)
        assert got.tolist() == want


def test_lttb_keeps_endpoints_and_spike():
    # flat series with one spike: the spike must survive
    t = np.arange(100, dtype=float)
    v = np.ones(100)
    v[57] = 40.0
    idx = lttb_numpy(t, v, 10)
    assert idx[0] == 0 and idx[-1] == 99
    assert 57 in idx.tolist()
    assert idx.size == 10


def test_lttb_invalid_n_out_fails_fast(spark, events):
    with pytest.raises(ValueError):
        lttb_numpy(np.arange(2.0), np.arange(2.0), 2)
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    with pytest.raises(ValueError):
        lttb(ev, n_out=2)  # driver-side, before any job runs


def test_lttb_passthrough_short_series():
    t = np.arange(4, dtype=float)
    v = np.ones(4)
    assert lttb_numpy(t, v, 10).tolist() == [0, 1, 2, 3]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(3, 400),
    n_out=st.integers(3, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_lttb_property_vs_naive(n, n_out, seed):
    rng = np.random.default_rng(seed)
    # duplicate timestamps and constant stretches included on purpose
    t = np.sort(rng.choice(rng.uniform(0, 1e4, max(3, n // 2)), n, replace=True))
    v = np.where(rng.random(n) < 0.2, 7.0, rng.normal(0, 1000, n))
    got = lttb_numpy(t, v, n_out)
    want = np.asarray(naive_lttb(list(t), list(v), n_out))
    assert got.tolist() == want.tolist()
    assert got[0] == 0 and got[-1] == n - 1
    assert (np.diff(got) > 0).all()
    assert got.size == min(n, n_out)


def test_lttb_spark_matches_numpy(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value").filter(
        F.col("key") < 20
    )
    out = lttb(ev, n_out=12).toPandas()
    pdf = ev.toPandas().sort_values(["key", "ts", "value"], kind="stable")
    for key, g in pdf.groupby("key"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
        v = g["value"].to_numpy(np.float64)
        idx = lttb_numpy(t, v, 12)
        want_ts = g["ts"].iloc[idx].astype("datetime64[us]").to_numpy()
        got = out[out.key == key].sort_values("pt_idx")
        assert got.ts.astype("datetime64[us]").to_numpy().tolist() == want_ts.tolist()
        assert np.allclose(got.value.to_numpy(), v[idx])


def test_lttb_one_shuffle_plan(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    plan = lttb(ev, 12)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
