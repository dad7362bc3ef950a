from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.lmoments import lmoments_by_key


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, vals, key="k"):
    rows = [
        (key, BASE + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _ref(vals):
    c = np.sort(np.round(np.asarray(vals) * 100).astype(np.int64))
    n = len(c)
    i = np.arange(1, n + 1, dtype=object)
    b0 = int(c.astype(object).sum())
    b1 = int(((i - 1) * c).sum())
    b2 = int(((i - 1) * (i - 2) * c).sum())
    l1 = b0 / (n * 100.0)
    l2n = 2 * b1 - (n - 1) * b0
    l2 = l2n / (n * (n - 1) * 100.0)
    l3n = 6 * b2 - 6 * (n - 2) * b1 + (n - 1) * (n - 2) * b0
    t3 = l3n / (l2n * (n - 2)) if l2n else None
    return l1, l2, t3


def test_lmoments_uniform_integers_closed_form(spark):
    n = 100
    out = lmoments_by_key(_mk(spark, list(range(1, n + 1)))).collect()[0]
    # sample 1..n: l1 = (n+1)/2, l2 = (n+1)/6 (half the Gini mean
    # difference (n+1)/3), t3 = 0 by symmetry
    assert out.l1_u6 == int((n + 1) / 2 * 1e6)
    assert out.l2_u6 == pytest.approx((n + 1) / 6 * 1e6, abs=1)
    assert abs(out.t3_u6) <= 1  # floor lattice slack around exact 0


def test_lmoments_matches_reference_and_skew_sign(spark):
    rng = np.random.default_rng(8)
    sym = np.round(rng.normal(50, 5, 300), 2)
    skw = np.round(rng.exponential(10, 300), 2)
    df = _mk(spark, sym, "sym").unionAll(_mk(spark, skw, "skw"))
    out = {r.key: r for r in lmoments_by_key(df).collect()}
    for k, vals in (("sym", sym), ("skw", skw)):
        l1, l2, t3 = _ref(vals)
        assert out[k].l1_u6 == int(np.floor(l1 * 1e6))
        assert out[k].l2_u6 == int(np.floor(l2 * 1e6))
        assert out[k].t3_u6 == int(np.floor(t3 * 1e6))
    # exponential: t3 ~ 1/3; normal: ~0
    assert out["skw"].t3_u6 > 250_000
    assert abs(out["sym"].t3_u6) < 100_000


def test_lmoments_constant_and_short_series(spark):
    const = lmoments_by_key(_mk(spark, [5.0] * 10)).collect()[0]
    assert const.l2_u6 == 0 and const.t3_u6 is None
    assert lmoments_by_key(_mk(spark, [1.0, 2.0])).collect() == []
