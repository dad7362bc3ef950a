from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.iact import iact_by_key


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _rows(key, vals):
    return [
        (key, BASE + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(vals)
    ]


def _ref_tau(vals, m=20):
    c = np.round(np.asarray(vals) * 100).astype(np.int64)
    n = len(c)
    d = (n * c - c.sum()).astype(object)  # exact big ints
    dd = int((d * d).sum())
    nn = sum(int((d[:-k] * d[k:]).sum()) for k in range(1, m + 1))
    return 1.0 + 2.0 * (nn / dd)


def test_iact_iid_near_one_and_persistent_large(spark):
    rng = np.random.default_rng(4)
    iid = rng.normal(100, 10, 400).round(2)
    # strongly persistent: slow random walk-ish (AR(1), phi=0.95)
    ar = np.empty(400)
    ar[0] = 0.0
    eps = rng.normal(0, 1, 400)
    for i in range(1, 400):
        ar[i] = 0.95 * ar[i - 1] + eps[i]
    ar = (ar * 10 + 100).round(2)
    df = _mk(spark, _rows("iid", iid) + _rows("ar", ar))
    out = {r.key: r for r in iact_by_key(df).collect()}
    tau_iid = out["iid"].tau_u6 / 1e6
    tau_ar = out["ar"].tau_u6 / 1e6
    assert abs(tau_iid - 1.0) < 0.6
    assert tau_ar > 5.0
    assert out["ar"].ess_u6 < out["iid"].ess_u6
    # exact vs the integer reference recursion
    assert out["iid"].tau_u6 == int(np.floor(_ref_tau(iid) * 1e6))
    assert out["ar"].tau_u6 == int(np.floor(_ref_tau(ar) * 1e6))


def test_iact_constant_series_drops_antipersistent_null_ess(spark):
    const = _rows("c", [5.0] * 50)
    alt = _rows("alt", [10.0 if i % 2 == 0 else -10.0 for i in range(100)])
    out = {r.key: r for r in iact_by_key(_mk(spark, const + alt)).collect()}
    assert "c" not in out  # zero variance
    # perfectly alternating series: odd/even lag correlations nearly
    # cancel, tau < 1 (antithetic), so ESS exceeds the sample size
    assert out["alt"].tau_u6 == int(np.floor(_ref_tau([10.0 if i % 2 == 0 else -10.0 for i in range(100)]) * 1e6))
    assert 0 < out["alt"].tau_u6 < 1_000_000
    assert out["alt"].ess_u6 > 100 * 1_000_000
