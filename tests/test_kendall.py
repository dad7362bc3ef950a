"""Kendall tau-b on the LOCF grid: merge-count vs brute force,
planted monotone/anti-monotone coupling, tie/degeneracy handling,
grid reuse."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid
from tits_spark.operators.kendall import (
    _tie_pairs,
    kendall_tau,
    merge_count_inversions,
)

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600.0


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _r6(v):
    """Half-away-from-zero round to 6 (Spark F.round / DuckDB round);
    Python's built-in round is half-even and disagrees on exact .5s."""
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _brute_tau(x, y):
    """O(n^2) reference: exact pair counts + the operator's tau tree."""
    n = len(x)
    nc = nd = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                txy += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                nc += 1
            if dx * dy < 0:
                nd += 1
    tot = n * (n - 1) // 2
    num = float(tot - tx - ty + txy - 2 * nd)
    tau = gamma = d_yx = d_xy = None
    if tot > tx and tot > ty:
        tau = _r6(num / np.sqrt(float(tot - tx) * float(tot - ty)))
    if tot - tx - ty + txy > 0:
        gamma = _r6(num / float(tot - tx - ty + txy))
    if tot > tx:
        d_yx = _r6(num / float(tot - tx))
    if tot > ty:
        d_xy = _r6(num / float(tot - ty))
    return {"n_obs": n, "tie_x": tx, "tie_y": ty, "tie_xy": txy,
            "n_dis": nd, "tau_b": tau, "gamma": gamma,
            "d_yx": d_yx, "d_xy": d_xy}


def test_merge_count_matches_brute_force():
    rng = np.random.default_rng(11)
    for _ in range(80):
        n = int(rng.integers(0, 80))
        a = rng.integers(-6, 7, n).astype(np.int64)
        brute = sum(
            1 for i in range(n) for j in range(i + 1, n) if a[i] > a[j]
        )
        assert merge_count_inversions(a) == brute


def test_tie_pairs_exact():
    assert _tie_pairs(np.array([1, 1, 1, 2], dtype=np.int64)) == 3
    assert _tie_pairs(np.array([5], dtype=np.int64)) == 0
    assert _tie_pairs(np.array([2, 2, 2, 2], dtype=np.int64)) == 6


def test_kendall_matches_brute_force_counts(spark):
    rng = np.random.default_rng(3)
    rows = []
    per_key = {}
    for k in ("a", "b", "c"):
        xs = rng.integers(90, 111, 24).tolist()
        ys = rng.integers(90, 111, 24).tolist()
        per_key[k] = (xs, ys)
        for i, (xv, yv) in enumerate(zip(xs, ys)):
            # both sides tick INSIDE every bucket -> grid == raw pairs
            rows.append((k, _t(i * HOUR + 10), float(xv), "x"))
            rows.append((k, _t(i * HOUR + 20), float(yv), "y"))
    out = {
        r["key"]: r
        for r in kendall_tau(_mk(spark, rows), bucket_secs=3600).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for k, (xs, ys) in per_key.items():
        # grid LOCF: x resolves from bucket 0 on, y likewise -> the
        # aligned rows are exactly the per-bucket (x*100, y*100) pairs
        want = _brute_tau([v * 100 for v in xs], [v * 100 for v in ys])
        got = out[k]
        for col in ("n_obs", "tie_x", "tie_y", "tie_xy", "n_dis",
                    "tau_b", "gamma", "d_yx", "d_xy"):
            assert got[col] == want[col], (k, col, got[col], want[col])


def test_planted_monotone_and_anti(spark):
    rows = []
    for i in range(30):
        rows.append(("up", _t(i * HOUR + 1), 100.0 + i, "x"))
        rows.append(("up", _t(i * HOUR + 2), 50.0 + 2 * i, "y"))
        rows.append(("dn", _t(i * HOUR + 1), 100.0 + i, "x"))
        rows.append(("dn", _t(i * HOUR + 2), 50.0 - 3 * i, "y"))
    out = {r["key"]: r for r in kendall_tau(_mk(spark, rows)).collect()}
    assert out["up"]["tau_b"] == 1.0
    assert out["dn"]["tau_b"] == -1.0
    assert out["up"]["n_dis"] == 0
    assert out["up"]["gamma"] == 1.0 and out["up"]["d_yx"] == 1.0
    assert out["dn"]["gamma"] == -1.0 and out["dn"]["d_xy"] == -1.0


def test_constant_side_is_null(spark):
    rows = []
    for i in range(10):
        rows.append(("k", _t(i * HOUR + 1), 100.0, "x"))  # constant
        rows.append(("k", _t(i * HOUR + 2), float(i % 3), "y"))
    out = kendall_tau(_mk(spark, rows), bucket_secs=3600).collect()
    assert len(out) == 1
    assert out[0]["tau_b"] is None
    # all pairs are x-ties: d_yx undefined too, and every non-x-tie
    # pair vanishes so gamma's nc+nd denominator is 0
    assert out[0]["d_yx"] is None
    assert out[0]["gamma"] is None
    n = out[0]["n_obs"]
    assert out[0]["tie_x"] == n * (n - 1) // 2


def test_min_points_gate_and_grid_reuse(spark):
    rows = []
    for i in range(2):  # too short: below min_points=4
        rows.append(("short", _t(i * HOUR), 1.0 + i, "x"))
        rows.append(("short", _t(i * HOUR + 1), 2.0 + i, "y"))
    for i in range(12):
        rows.append(("long", _t(i * HOUR), 1.0 + i, "x"))
        rows.append(("long", _t(i * HOUR + 1), 2.0 + i * i, "y"))
    df = _mk(spark, rows)
    out = kendall_tau(df, bucket_secs=3600)
    assert [r["key"] for r in out.collect()] == ["long"]
    # passing a pre-built grid gives the identical result
    grid = locf_bucket_grid(df, bucket_secs=3600)
    out2 = kendall_tau(df, bucket_secs=3600, grid=grid)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_locf_fill_counts_carried_values(spark):
    # y ticks only every other bucket: LOCF duplicates it, creating
    # y-ties the counts must reflect (vs naive pairing of raw ticks)
    rows = []
    for i in range(8):
        rows.append(("k", _t(i * HOUR + 1), float(i), "x"))
        if i % 2 == 0:
            rows.append(("k", _t(i * HOUR + 2), float(10 + i), "y"))
    out = kendall_tau(_mk(spark, rows), bucket_secs=3600).collect()[0]
    assert out["n_obs"] == 8
    # y values: 10,10,12,12,14,14,16,16 -> 4 tie groups of 2 -> 4 pairs
    assert out["tie_y"] == 4
    assert out["tie_x"] == 0
    # x strictly increasing, y non-decreasing -> no discordant pairs
    assert out["n_dis"] == 0
    assert out["tau_b"] is not None and out["tau_b"] > 0.9
