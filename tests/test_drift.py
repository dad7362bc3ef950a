from __future__ import annotations

import numpy as np
import pytest

from tits_spark.operators.drift import w1_vs_global


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, value double")


def test_w1_shifted_key_measures_the_shift(spark):
    # key "lo" uniform on [0,10) dollars, key "hi" the same shape
    # shifted +20 dollars: W1(lo, global) == W1(hi, global) == 10 bins
    # (global is the 50/50 mixture, each CDF is 0.5 off over 20 bins)
    rows = [("lo", float(v)) for v in range(0, 10)] * 10
    rows += [("hi", float(v) + 20.0) for v in range(0, 10)] * 10
    out = {r.key: r for r in w1_vs_global(_mk(spark, rows), bin_cents=100).collect()}
    assert out["lo"].n == 100 and out["hi"].n == 100
    # each key is 0.5 away from the mixture CDF across the 20-bin gap
    # -> W1 = 0.5 * 20 = 10 bins
    assert out["lo"].w1_u6 == pytest.approx(10_000_000, abs=1_000_000)
    assert out["lo"].w1_u6 == out["hi"].w1_u6  # symmetric mixture


def test_w1_identical_key_is_zero(spark):
    rows = [(k, float(v % 7)) for k in ("a", "b") for v in range(70)]
    out = {r.key: r.w1_u6 for r in w1_vs_global(_mk(spark, rows)).collect()}
    assert out["a"] == 0 and out["b"] == 0


def test_w1_matches_scipy_style_reference(spark):
    rng = np.random.default_rng(12)
    va = np.round(rng.uniform(0, 50, 200), 2)
    vb = np.round(rng.uniform(25, 99, 300), 2)
    rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
    out = {r.key: r for r in w1_vs_global(_mk(spark, rows), bin_cents=100).collect()}

    def ref(x, pooled):
        xb = np.floor(np.round(x * 100) / 100).astype(int)
        pb = np.floor(np.round(pooled * 100) / 100).astype(int)
        support = np.unique(pb)
        dv = np.diff(support, append=support[-1])
        fa = np.searchsorted(np.sort(xb), support, side="right") / len(xb)
        fg = np.searchsorted(np.sort(pb), support, side="right") / len(pb)
        return float((np.abs(fa - fg) * dv).sum())

    pooled = np.concatenate([va, vb])
    for k, x in (("a", va), ("b", vb)):
        assert out[k].w1_u6 / 1e6 == pytest.approx(ref(x, pooled), abs=2e-3)
