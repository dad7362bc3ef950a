from __future__ import annotations

import datetime as dt
import math

from tits_spark.operators.mutual_info import mutual_info_type_hour


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, event_type string")


def test_mi_zero_for_independent_and_ln2_for_deterministic(spark):
    rows = []
    # key "ind": every (type, hour) combination equally often -> MI = 0
    for d in range(4):
        for h in (9, 17):
            for t in ("a", "b"):
                rows.append(("ind", BASE + dt.timedelta(days=d, hours=h), t))
    # key "det": type fully determined by hour (a@9, b@17), balanced ->
    # MI = ln(2)
    for d in range(8):
        rows.append(("det", BASE + dt.timedelta(days=d, hours=9), "a"))
        rows.append(("det", BASE + dt.timedelta(days=d, hours=17), "b"))
    out = {r.key: r for r in mutual_info_type_hour(_mk(spark, rows)).collect()}
    assert out["ind"].mi_u6 == 0
    assert abs(out["det"].mi_u6 - int(math.log(2) * 1e6)) <= 1
    assert out["det"].n == 16 and out["det"].n_cells == 2


def test_mi_partitioning_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(6)
    rows = [
        (
            f"u{int(j)}",
            BASE + dt.timedelta(hours=int(h)),
            ["a", "b", "c"][int(c)],
        )
        for j, h, c in zip(
            rng.integers(0, 5, 500), rng.integers(0, 400, 500), rng.integers(0, 3, 500)
        )
    ]
    df = _mk(spark, rows)
    a = sorted(map(tuple, mutual_info_type_hour(df).collect()))
    b = sorted(map(tuple, mutual_info_type_hour(df.repartition(13)).collect()))
    assert a == b
    assert all(r[3] >= 0 or r[3] >= -1 for r in a)  # MI >= 0 up to lattice slack


def _brute_chi2(pairs):
    """pairs: list of (type, hour). Full-grid Pearson chi-square."""
    from collections import Counter

    o = Counter(pairs)
    rows = sorted({u for u, _ in pairs})
    cols = sorted({v for _, v in pairs})
    n = len(pairs)
    ru = Counter(u for u, _ in pairs)
    cv = Counter(v for _, v in pairs)
    x2 = 0.0
    for u in rows:
        for v in cols:
            e = ru[u] * cv[v] / n
            x2 += (o.get((u, v), 0) - e) ** 2 / e
    mind = min(len(rows), len(cols)) - 1
    vstat = math.sqrt(x2 / (n * mind)) if mind >= 1 else None
    return x2, len(rows), len(cols), vstat


def test_chi2_brute_force_parity(spark):
    import numpy as np

    from tits_spark.operators.mutual_info import chi2_independence

    rng = np.random.default_rng(5)
    rows, per_key = [], {}
    for k in range(3):
        pairs = []
        for i in range(120):
            t = ("a", "b", "c")[int(rng.integers(0, 3))]
            h = int(rng.integers(0, 5)) * 3 + 6
            pairs.append((t, h))
            rows.append(
                (f"k{k}", BASE + dt.timedelta(days=i, hours=h), t)
            )
        per_key[f"k{k}"] = pairs
    out = {
        r["key"]: r
        for r in chi2_independence(_mk(spark, rows)).collect()
    }
    for k, pairs in per_key.items():
        x2, r, c, v = _brute_chi2(pairs)
        got = out[k]
        assert (got["r_cats"], got["c_cats"]) == (r, c)
        assert got["dof"] == (r - 1) * (c - 1)
        # per-cell floor-1e9 quantization: each OBSERVED cell can lose
        # up to 1e-9, so the reconstructed X2 sits within n_cells*1e-9
        assert abs(got["chi2"] - x2) < 1e-6
        assert abs(got["cramers_v"] - v) < 1e-6


def test_chi2_independent_is_zero_and_deterministic_is_max(spark):
    from tits_spark.operators.mutual_info import chi2_independence

    rows = []
    for d in range(6):
        for h in (9, 17):
            for t in ("a", "b"):
                rows.append(("ind", BASE + dt.timedelta(days=d, hours=h), t))
    for d in range(12):
        rows.append(("det", BASE + dt.timedelta(days=d, hours=9), "a"))
        rows.append(("det", BASE + dt.timedelta(days=d, hours=17), "b"))
    out = {
        r["key"]: r
        for r in chi2_independence(_mk(spark, rows)).collect()
    }
    assert out["ind"]["chi2"] == 0.0 and out["ind"]["cramers_v"] == 0.0
    # perfect association: X2 = n, Cramer's V = 1
    assert out["det"]["chi2"] == 24.0
    assert out["det"]["cramers_v"] == 1.0


def test_chi2_degenerate_single_category_is_null(spark):
    from tits_spark.operators.mutual_info import chi2_independence

    rows = [
        ("one", BASE + dt.timedelta(days=d, hours=9), "a") for d in range(10)
    ]
    got = chi2_independence(_mk(spark, rows)).collect()[0]
    assert got["chi2"] is None and got["cramers_v"] is None
    assert got["dof"] == 0
