"""Pairwise-order-statistic estimators: the value-space binary-search
selectors vs brute-force pair materialization, HL/Qn end-to-end vs an
O(n^2) numpy reference, tie/negative/min_points handling."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tits_spark.operators.pairstats import (
    kth_pair_diff,
    kth_pair_sum,
    robust_pair_stats,
)


def _brute_hl_x4(c: np.ndarray) -> int:
    n = c.size
    sums = np.sort(
        (c[:, None] + c[None, :])[np.triu_indices(n)]
    )
    nw = n * (n + 1) // 2
    k1 = (nw + 1) // 2
    k2 = nw // 2 + 1
    return int(sums[k1 - 1]) + int(sums[k2 - 1])


def _brute_qn_d(c: np.ndarray) -> int:
    n = c.size
    i, j = np.triu_indices(n, k=1)
    diffs = np.sort(np.abs(c[i] - c[j]))
    h = n // 2 + 1
    k = h * (h - 1) // 2
    return int(diffs[k - 1])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=2,
        max_size=40,
    )
)
def test_selectors_match_brute_force(vals):
    c = np.sort(np.array(vals, dtype=np.int64))
    n = c.size
    sums = np.sort((c[:, None] + c[None, :])[np.triu_indices(n)])
    for k in (1, len(sums) // 2 + 1, len(sums)):
        assert kth_pair_sum(c, k) == int(sums[k - 1])
    diffs = np.sort(
        (c[None, :] - c[:, None])[np.triu_indices(n, k=1)]
    )
    if diffs.size:
        for k in (1, diffs.size // 2 + 1, diffs.size):
            assert kth_pair_diff(c, k) == int(diffs[k - 1])


def test_hl_qn_end_to_end(spark):
    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    for key, n in (("a", 9), ("b", 24), ("c", 4)):
        vals = np.round(rng.normal(50, 20, n), 2)
        rows += [(key, float(v)) for v in vals]
        c = np.sort(np.round(vals * 100).astype(np.int64))
        expect[key] = (_brute_hl_x4(c), _brute_qn_d(c), n)
    df = spark.createDataFrame(rows, "key string, value double")
    out = {
        r["key"]: r
        for r in robust_pair_stats(df, min_points=4).collect()
    }
    assert set(out) == set(expect)
    for key, (hl_x4, qn_d, n) in expect.items():
        r = out[key]
        assert r["n_obs"] == n
        assert r["hl_x4"] == hl_x4
        assert r["qn_d"] == qn_d
        assert r["hl"] is not None and abs(r["hl"] - hl_x4 / 400.0) < 1e-6
        assert abs(r["qn"] - 2.2219 * qn_d / 100.0) < 1e-6


def test_constant_series_and_min_points(spark):
    rows = [("k", 5.0)] * 6 + [("tiny", 1.0)] * 3
    df = spark.createDataFrame(rows, "key string, value double")
    out = robust_pair_stats(df, min_points=4).collect()
    assert len(out) == 1  # "tiny" dropped
    r = out[0]
    # all-equal values: every Walsh sum is 1000, every distance 0
    assert r["hl_x4"] == 2000 and r["qn_d"] == 0
    assert r["hl"] == 5.0 and r["qn"] == 0.0


def test_negative_values(spark):
    vals = [-3.25, -1.5, 0.0, 2.75, -10.0, 4.5]
    c = np.sort(np.round(np.array(vals) * 100).astype(np.int64))
    df = spark.createDataFrame(
        [("k", float(v)) for v in vals], "key string, value double"
    )
    r = robust_pair_stats(df).collect()[0]
    assert r["hl_x4"] == _brute_hl_x4(c)
    assert r["qn_d"] == _brute_qn_d(c)
