"""Matrix profile: STOMP UDF path vs naive brute force vs decl twin."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.matrix_profile import (
    matrix_profile,
    matrix_profile_decl,
    mp_numpy,
)


def naive_mp(v: np.ndarray, m: int, excl: int, decimals: int = 6):
    """O(w^2 * m) direct definition: z-normalize every window, take the
    Euclidean distance, argmin outside the exclusion zone with ties to
    the smaller neighbor index. Uses the operator's documented
    zero-variance rule (algebraic e = m*s2 - s^2 > 0, the same
    expression the decl twin and SQL oracle evaluate) — the centered
    np.std classifies denormal-scale windows differently."""
    n = v.size
    w = n - m + 1
    wins = np.lib.stride_tricks.sliding_window_view(v, m).astype(np.float64)
    mu = wins.mean(axis=1)
    s = wins.sum(axis=1)
    e = m * (wins * wins).sum(axis=1) - s * s
    with np.errstate(invalid="ignore"):
        sd = np.sqrt(e) / m
    ok = e > 0
    mp = np.full(w, np.nan)
    nn = np.full(w, -1, dtype=np.int64)
    for i in range(w):
        if not ok[i]:
            continue
        best, bj = np.inf, -1
        zi = (wins[i] - mu[i]) / sd[i]
        for j in range(w):
            if abs(j - i) < max(excl, 1) or not ok[j]:
                continue
            zj = (wins[j] - mu[j]) / sd[j]
            d = round(float(np.sqrt(((zi - zj) ** 2).sum())), decimals)
            if d < best or (d == best and j < bj):
                best, bj = d, j
        if bj >= 0:
            mp[i], nn[i] = best, bj
    return mp, nn


def test_mp_numpy_matches_naive():
    rng = np.random.default_rng(7)
    v = rng.normal(50.0, 10.0, 80)
    for m, excl in [(8, 4), (5, 1), (16, 8)]:
        mp, nn = mp_numpy(v, m, excl)
        ref_mp, ref_nn = naive_mp(v, m, excl)
        assert np.allclose(mp, ref_mp, atol=1e-5, equal_nan=True)
        keep = ~np.isnan(mp)
        assert (nn[keep] == ref_nn[keep]).all()


def test_constant_windows_excluded():
    # a flat run longer than m makes zero-variance windows: those must
    # appear neither as queries (NaN profile) nor as anyone's neighbor
    v = np.concatenate([np.sin(np.arange(30)), np.full(12, 3.0),
                        np.cos(np.arange(30))])
    m, excl = 8, 4
    mp, nn = mp_numpy(v, m, excl)
    ref_mp, ref_nn = naive_mp(v, m, excl)
    assert np.isnan(mp[34])  # fully inside the flat run
    assert np.allclose(mp, ref_mp, atol=1e-5, equal_nan=True)
    keep = ~np.isnan(mp)
    assert (nn[keep] == ref_nn[keep]).all()
    assert 34 not in set(nn[keep])


def test_planted_motif_found():
    rng = np.random.default_rng(11)
    v = rng.normal(0.0, 1.0, 120)
    shape = np.array([0.0, 3.0, 6.0, 3.0, 0.0, -3.0, -6.0, -3.0])
    v[10:18] += 10 * shape
    v[70:78] += 10 * shape
    mp, nn = mp_numpy(v, 8, 4)
    # the two planted occurrences are each other's nearest neighbor
    assert nn[10] == 70 and nn[70] == 10
    assert mp[10] < np.nanmedian(mp) / 2


def _mk_df(spark, series: dict[str, np.ndarray]):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=37 * i + (i % 5)), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_udf_matches_decl(spark):
    rng = np.random.default_rng(3)
    df = _mk_df(spark, {
        "a": rng.normal(100.0, 20.0, 60),
        "b": rng.normal(5.0, 1.0, 45),
        "c": rng.normal(0.0, 4.0, 12),   # shorter than useful, still valid
    })
    a = matrix_profile(df, m=8).toPandas().sort_values(["key", "wi"])
    b = matrix_profile_decl(df, m=8).toPandas().sort_values(["key", "wi"])
    assert list(a["key"]) == list(b["key"])
    assert list(a["wi"]) == list(b["wi"])
    assert list(a["nn"]) == list(b["nn"])
    assert np.allclose(a["mp"].to_numpy(), b["mp"].to_numpy(), atol=1e-5)
    assert list(a["ts"]) == list(b["ts"])


def test_m_guard(spark):
    df = _mk_df(spark, {"a": np.arange(10.0)})
    with pytest.raises(ValueError):
        matrix_profile(df, m=2)
    with pytest.raises(ValueError):
        matrix_profile_decl(df, m=2)


def test_pattern_search_finds_planted(spark):
    rng = np.random.default_rng(21)
    shape = [0.0, 5.0, 10.0, 5.0, 0.0, -5.0, -10.0, -5.0]
    series = {}
    for i in range(6):
        v = rng.normal(0, 1, 90)
        series[f"s{i}"] = v
    # plant scaled/shifted copies (z-norm invariant) in two series
    series["s1"][30:38] = 3.0 * np.array(shape) + 40.0
    series["s4"][60:68] = 0.5 * np.array(shape) - 7.0
    df = _mk_df(spark, series)
    from tits_spark.operators.matrix_profile import pattern_search

    top = pattern_search(df, shape, k=2).collect()
    got = {(r["key"], r["wi"]): r["dist"] for r in top}
    assert set(got) == {("s1", 30), ("s4", 60)}
    for d in got.values():
        assert d < 1e-4          # exact shape up to affine transform


def test_pattern_search_determinism_and_guards(spark):
    import pytest as _pt

    from tits_spark.operators.matrix_profile import (
        normalized_pattern,
        pattern_search,
    )

    with _pt.raises(ValueError):
        normalized_pattern([1.0, 1.0, 1.0])
    with _pt.raises(ValueError):
        normalized_pattern([1.0, 2.0])
    rng = np.random.default_rng(5)
    df = _mk_df(spark, {"a": rng.normal(0, 1, 50), "b": rng.normal(0, 1, 50)})
    a = [r.asDict() for r in pattern_search(df, [0, 1, 2, 1, 0, -1], k=5).collect()]
    b = [r.asDict() for r in
         pattern_search(df.repartition(7), [0, 1, 2, 1, 0, -1], k=5).collect()]
    assert a == b and len(a) == 5
