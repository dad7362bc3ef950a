"""Mann–Whitney U, Kruskal–Wallis H, Cramér–von Mises, Anderson–Darling."""

from __future__ import annotations

import numpy as np
import pytest

from tits_spark.operators.rank_tests import (
    anderson_darling,
    cvm_two_sample,
    kruskal_wallis,
    mann_whitney,
)


def _two_sample_df(spark, a, b, key="k"):
    rows = [(key, float(x), True) for x in a] + [(key, float(x), False) for x in b]
    return spark.createDataFrame(rows, "key string, value double, is_a boolean")


def _midranks(pooled):
    """Average ranks (1-based) of a pooled sample, ties averaged."""
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), dtype=float)
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


# --------------------------------------------------------- Mann–Whitney


def naive_mwu(a, b):
    """Brute-force U_A = #{(i,j): a_i > b_j} + 0.5 * ties."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    return gt + 0.5 * eq


def test_mwu_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    a = np.round(rng.normal(10, 2, 80), 2)
    b = np.round(rng.normal(10.5, 2, 120), 2)
    row = mann_whitney(_two_sample_df(spark, a, b)).collect()[0]
    u = naive_mwu(a, b)
    assert row["n_a"] == 80 and row["n_b"] == 120
    assert row["u2"] == round(2 * u)
    # z against the direct tie-corrected formula
    n, m = 80.0, 120.0
    pooled = np.concatenate([a, b])
    _, counts = np.unique(pooled, return_counts=True)
    tie3 = float((counts**3 - counts).sum())
    big_n = n + m
    var = (n * m / 12.0) * ((big_n + 1) - tie3 / (big_n * (big_n - 1)))
    z = (u - n * m / 2.0) / np.sqrt(var)
    assert row["z"] == pytest.approx(z, abs=1e-6)


def test_mwu_symmetric_samples_zero_z(spark):
    # identical samples: U = n*m/2 exactly, so u2 = 2U = n*m
    vals = [1.0, 2.0, 2.0, 5.0, 7.0]
    row = mann_whitney(_two_sample_df(spark, vals, vals)).collect()[0]
    assert row["u2"] == len(vals) ** 2
    assert row["z"] == 0.0


def test_mwu_total_separation(spark):
    # every a above every b: U_A = n*m
    row = mann_whitney(_two_sample_df(spark, [10.0, 11.0], [1.0, 2.0, 3.0])).collect()[0]
    assert row["u2"] == 2 * 2 * 3


# -------------------------------------------------------- Kruskal–Wallis


def naive_kw(groups):
    """Direct tie-corrected H over a dict of group -> values."""
    pooled = np.concatenate([np.asarray(v, float) for v in groups.values()])
    ranks = _midranks(pooled)
    big_n = len(pooled)
    h = 0.0
    i = 0
    for v in groups.values():
        r = ranks[i : i + len(v)]
        h += r.sum() ** 2 / len(v)
        i += len(v)
    h = 12.0 / (big_n * (big_n + 1)) * h - 3 * (big_n + 1)
    _, counts = np.unique(pooled, return_counts=True)
    tie3 = float((counts**3 - counts).sum())
    return h / (1.0 - tie3 / (big_n**3 - big_n))


def test_kw_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    groups = {
        "a": np.round(rng.normal(0, 1, 50), 1),
        "b": np.round(rng.normal(0.4, 1, 70), 1),
        "c": np.round(rng.normal(-0.2, 1.5, 60), 1),
    }
    rows = [
        ("k", g, float(x)) for g, vals in groups.items() for x in vals
    ]
    df = spark.createDataFrame(rows, "key string, grp string, value double")
    row = kruskal_wallis(df).collect()[0]
    assert row["n_obs"] == 180 and row["n_groups"] == 3
    assert row["h"] == pytest.approx(naive_kw(groups), abs=1e-6)


def test_kw_single_group_null(spark):
    df = spark.createDataFrame(
        [("k", "only", 1.0), ("k", "only", 2.0)],
        "key string, grp string, value double",
    )
    row = kruskal_wallis(df).collect()[0]
    assert row["h"] is None


def test_kw_all_tied_null(spark):
    df = spark.createDataFrame(
        [("k", "a", 3.0), ("k", "b", 3.0), ("k", "a", 3.0)],
        "key string, grp string, value double",
    )
    row = kruskal_wallis(df).collect()[0]
    assert row["h"] is None  # tie correction hits zero


# ------------------------------------------------------ Cramér–von Mises


def naive_cvm(a, b):
    """T = n*m/N^2 * sum over pooled obs of (F_a - F_b)^2 (tie-aware)."""
    a, b = np.sort(np.asarray(a, float)), np.sort(np.asarray(b, float))
    n, m = len(a), len(b)
    pooled = np.concatenate([a, b])
    fa = np.searchsorted(a, pooled, side="right") / n
    fb = np.searchsorted(b, pooled, side="right") / m
    return n * m / (n + m) ** 2 * float(((fa - fb) ** 2).sum())


def test_cvm_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    a = np.round(rng.normal(5, 1, 90), 2)
    b = np.round(rng.normal(5.3, 1.2, 110), 2)
    row = cvm_two_sample(_two_sample_df(spark, a, b)).collect()[0]
    assert row["n_a"] == 90 and row["n_b"] == 110
    assert row["cvm_t"] == pytest.approx(naive_cvm(a, b), abs=1e-6)


def test_cvm_identical_zero(spark):
    vals = [1.0, 2.0, 2.0, 4.0]
    row = cvm_two_sample(_two_sample_df(spark, vals, vals)).collect()[0]
    assert row["cvm_t"] == 0.0


def test_cvm_greater_on_separated(spark):
    near = cvm_two_sample(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [1.5, 2.5, 3.5])
    ).collect()[0]["cvm_t"]
    far = cvm_two_sample(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [10.0, 11.0, 12.0])
    ).collect()[0]["cvm_t"]
    assert far > near


# ----------------------------------------------------- Anderson–Darling


def naive_ad(a, b):
    """Scholz–Stephens A²_akN for k=2 (midrank / tie-adjusted form)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    pooled = np.concatenate([a, b])
    u, t = np.unique(pooled, return_counts=True)
    ca = np.array([(a == v).sum() for v in u], float)
    cb = np.array([(b == v).sum() for v in u], float)
    n_a, n_b = len(a), len(b)
    big_n = float(n_a + n_b)
    big_c = np.cumsum(t).astype(float)
    bj = big_c - t / 2.0
    ma = np.cumsum(ca) - ca / 2.0
    mb = np.cumsum(cb) - cb / 2.0
    den = bj * (big_n - bj) - big_n * t / 4.0
    terms = (t / big_n) * (
        (big_n * ma - n_a * bj) ** 2 / n_a + (big_n * mb - n_b * bj) ** 2 / n_b
    ) / den
    return (big_n - 1) / big_n * float(terms.sum())


def test_ad_matches_bruteforce(spark):
    rng = np.random.default_rng(17)
    a = np.round(rng.normal(3, 1, 70), 2)
    b = np.round(rng.normal(3.4, 1.3, 130), 2)
    row = anderson_darling(_two_sample_df(spark, a, b)).collect()[0]
    assert row["n_a"] == 70 and row["n_b"] == 130
    assert row["a2"] == pytest.approx(naive_ad(a, b), abs=1e-6)


def test_ad_identical_zero(spark):
    vals = [1.0, 2.0, 3.0, 7.0]
    row = anderson_darling(_two_sample_df(spark, vals, vals)).collect()[0]
    assert row["a2"] == 0.0


def test_ad_all_tied_null(spark):
    row = anderson_darling(
        _two_sample_df(spark, [5.0, 5.0], [5.0, 5.0, 5.0])
    ).collect()[0]
    assert row["a2"] is None


def test_ad_greater_on_separated(spark):
    near = anderson_darling(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [1.5, 2.5, 3.5])
    ).collect()[0]["a2"]
    far = anderson_darling(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [10.0, 11.0, 12.0])
    ).collect()[0]["a2"]
    assert far > near
