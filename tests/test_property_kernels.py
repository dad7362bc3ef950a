"""Hypothesis fuzz for the session's pure-numpy kernels against their
naive-definition twins (no Spark: these run in milliseconds)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_dtw import naive_dtw
from tests.test_matrix_profile import naive_mp
from tests.test_trend import naive_mk
from tits_spark.operators.dtw import dtw_numpy
from tits_spark.operators.matrix_profile import mp_numpy
from tits_spark.operators.trend import _median_pinned, mk_numpy

finite = st.floats(-1e3, 1e3, allow_nan=False, width=64)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(finite, min_size=12, max_size=40),
    st.sampled_from([4, 5, 8]),
)
def test_mp_matches_naive(vals, m):
    v = np.asarray(vals)
    excl = m // 2
    mp, nn = mp_numpy(v, m, excl)
    ref_mp, ref_nn = naive_mp(v, m, excl)
    assert np.allclose(mp, ref_mp, atol=1e-4, equal_nan=True)
    keep = ~np.isnan(mp) & ~np.isnan(ref_mp)
    # neighbor indices agree except at quantized ties the naive float
    # path resolves differently (both are then equal-distance answers)
    diff = keep & (nn != ref_nn)
    assert np.allclose(mp[diff], ref_mp[diff], atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(finite, min_size=4, max_size=10),
    st.lists(finite, min_size=4, max_size=10),
)
def test_dtw_matches_naive_bitexact(xs, ys):
    s = min(len(xs), len(ys))
    x, y = np.asarray(xs[:s]), np.asarray(ys[:s])
    assert dtw_numpy(x, y)[0] == naive_dtw(x, y)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-50, 50), min_size=4, max_size=30),
    st.lists(st.integers(1, 20), min_size=4, max_size=30),
)
def test_mk_matches_naive(vals, gaps):
    n = min(len(vals), len(gaps))
    v = np.asarray(vals[:n], dtype=np.float64) / 2.0  # ties guaranteed
    t = np.cumsum(np.asarray(gaps[:n], dtype=np.float64))
    s, var_s, z, slope = mk_numpy(t, v)
    ns, nvar, nslopes = naive_mk(list(t), list(v))
    assert s == ns and var_s == nvar
    if nslopes:
        assert slope == _median_pinned(np.asarray(nslopes))
    else:
        assert np.isnan(slope)
