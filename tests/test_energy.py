"""Energy-distance two-sample test: O(n^2) brute-force parity for all
three pairwise sums, planted same-vs-shifted distributions, ties,
min_points, and the one-scan one-exchange plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.energy import energy_distance


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, value double, series string"
    )


def _brute(cx, cy):
    cx = np.asarray(cx, dtype=np.int64)
    cy = np.asarray(cy, dtype=np.int64)
    sxx = int(np.abs(cx[:, None] - cx[None, :]).sum() // 2)
    syy = int(np.abs(cy[:, None] - cy[None, :]).sum() // 2)
    sxy = int(np.abs(cx[:, None] - cy[None, :]).sum())
    nx, ny = cx.size, cy.size
    e = (
        2.0 * sxy / (nx * ny)
        - 2.0 * sxx / (nx * nx)
        - 2.0 * syy / (ny * ny)
    ) / 100.0
    t = nx * ny / (nx + ny) * e
    return sxx, syy, sxy, e, t


def test_brute_force_parity_with_ties(spark):
    rng = np.random.default_rng(5)
    rows, expect = [], {}
    for key, (nx, ny, shift) in {
        "same": (25, 30, 0.0),
        "shifted": (20, 22, 15.0),
        "tied": (12, 14, 0.0),
    }.items():
        x = np.round(rng.normal(50, 10, nx), 2)
        y = np.round(rng.normal(50 + shift, 10, ny), 2)
        if key == "tied":  # force heavy cross- and within-side ties
            x = np.round(x / 5) * 5
            y = np.round(y / 5) * 5
        rows += [(key, float(v), "x") for v in x]
        rows += [(key, float(v), "y") for v in y]
        expect[key] = _brute(
            np.round(x * 100).astype(np.int64),
            np.round(y * 100).astype(np.int64),
        )
    out = {r["key"]: r for r in energy_distance(_mk(spark, rows)).collect()}
    assert set(out) == set(expect)
    for key, (sxx, syy, sxy, e, t) in expect.items():
        r = out[key]
        assert int(r["sum_xx"]) == sxx and int(r["sum_yy"]) == syy
        assert int(r["sum_xy"]) == sxy
        assert abs(r["e_stat"] - e) < 1e-6
        assert abs(r["t_stat"] - t) < 1e-6
    # a planted 1.5-sigma shift must clearly dominate the
    # same-distribution key (E carries value units, so "same" is
    # small-but-nonzero at finite n, not ~0)
    assert out["shifted"]["t_stat"] > 2 * out["same"]["t_stat"]


def test_identical_samples_zero(spark):
    vals = [1.0, 2.5, 2.5, 7.0, 9.25, 3.0]
    rows = [("k", v, "x") for v in vals] + [("k", v, "y") for v in vals]
    r = energy_distance(_mk(spark, rows)).collect()[0]
    # identical multisets: E = 0 exactly (integer identity, no float)
    assert r["e_stat"] == 0.0 and r["t_stat"] == 0.0
    assert int(r["sum_xy"]) == 2 * int(r["sum_xx"])


def test_min_points_and_extra_series_ignored(spark):
    rows = [("k", 1.0, "x"), ("k", 2.0, "y"), ("k", 3.0, "y"),
            ("k", 9.0, "z"), ("ok", 1.0, "x"), ("ok", 4.0, "x"),
            ("ok", 2.0, "y"), ("ok", 3.0, "y")]
    out = energy_distance(_mk(spark, rows), min_points=2).collect()
    assert [r["key"] for r in out] == ["ok"]  # "k" has nx=1; "z" ignored
    r = out[0]
    assert r["nx"] == 2 and r["ny"] == 2


def test_plan_one_scan_one_exchange_no_python(spark):
    df = spark.createDataFrame(
        [("k", 1.0, "x"), ("k", 2.0, "y")],
        "key string, value double, series string",
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        energy_distance(df).explain("formatted")
    p = buf.getvalue()
    tree = [ln for ln in p.splitlines() if ":-" in ln or "+-" in ln]
    t = "\n".join(tree)
    assert "Join" not in t
    assert t.count("Exchange") == 1
    # no Python-execution nodes (the createDataFrame scan itself is an
    # ExistingRDD and mentions python in its detail lines)
    assert "EvalPython" not in p and "FlatMapGroupsInPandas" not in p
