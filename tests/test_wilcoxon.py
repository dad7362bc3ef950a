"""Wilcoxon signed-rank on the LOCF grid: brute-force midrank parity,
planted shift, zero-difference drop, x/y antisymmetry, min_points."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.wilcoxon import wilcoxon_signed_rank

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600.0


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _brute(xs, ys):
    """Midrank reference over cent pairs (ints)."""
    d = np.array(
        [x - y for x, y in zip(xs, ys) if x != y], dtype=np.int64
    )
    n = d.size
    a = np.abs(d)
    order = np.argsort(a, kind="stable")
    # midrank*2 per element
    mr2 = np.empty(n, dtype=np.int64)
    i = 0
    srt = a[order]
    while i < n:
        j = i
        while j < n and srt[j] == srt[i]:
            j += 1
        # ranks i+1..j share midrank (i+1 + j)/2 -> 2*mr = i+1+j
        mr2[order[i:j]] = i + 1 + j
        i = j
    w2 = int(mr2[d > 0].sum())
    _, counts = np.unique(a, return_counts=True)
    t = counts.astype(np.int64)
    tie = int((t * t * t - t).sum())
    var48 = 2 * n * (n + 1) * (2 * n + 1) - tie
    z = None
    if var48 > 0:
        z = round(
            float(w2 - n * (n + 1) // 2) / np.sqrt(var48 / 12.0), 6
        ) + 0.0
    return {"n_obs": n, "w2_pos": w2, "tie_sum": tie,
            "var48": var48, "z": z}


def _paired_rows(key, xs, ys):
    rows = []
    for i, (x, y) in enumerate(zip(xs, ys)):
        rows.append((key, _t(i * HOUR + 10), x / 100.0, "x"))
        rows.append((key, _t(i * HOUR + 20), y / 100.0, "y"))
    return rows


def test_matches_brute_force_midranks(spark):
    rng = np.random.default_rng(9)
    rows, per_key = [], {}
    for k in ("a", "b"):
        xs = rng.integers(9500, 10600, 40).tolist()
        ys = rng.integers(9500, 10600, 40).tolist()
        per_key[k] = (xs, ys)
        rows += _paired_rows(k, xs, ys)
    out = {
        r["key"]: r
        for r in wilcoxon_signed_rank(_mk(spark, rows)).collect()
    }
    for k, (xs, ys) in per_key.items():
        want = _brute(xs, ys)
        got = out[k]
        for col in ("n_obs", "w2_pos", "tie_sum", "var48", "z"):
            assert got[col] == want[col], (k, col, got[col], want[col])


def test_planted_shift_maximal(spark):
    # x always 3 cents above y: every d = +3, one big tie group
    xs = [10000 + 7 * i for i in range(20)]
    ys = [x - 3 for x in xs]
    out = wilcoxon_signed_rank(_mk(spark, _paired_rows("k", xs, ys))).collect()[0]
    n = 20
    assert out["n_obs"] == n
    assert out["w2_pos"] == n * (n + 1)  # all positive: 2 * n(n+1)/2
    assert out["z"] > 3.0


def test_zero_differences_dropped(spark):
    xs = [10000 + i for i in range(15)]
    ys = list(xs)
    ys[0] -= 5
    ys[1] -= 5  # only two nonzero diffs -> below min_points, no row
    out = wilcoxon_signed_rank(_mk(spark, _paired_rows("k", xs, ys))).collect()
    assert out == []
    out = wilcoxon_signed_rank(
        _mk(spark, _paired_rows("k", xs, ys)), min_points=2
    ).collect()[0]
    assert out["n_obs"] == 2


def test_antisymmetry(spark):
    rng = np.random.default_rng(21)
    xs = rng.integers(9000, 11001, 30).tolist()
    ys = rng.integers(9000, 11001, 30).tolist()
    rows = _paired_rows("k", xs, ys)
    df = _mk(spark, rows)
    fwd = wilcoxon_signed_rank(df).collect()[0]
    rev = wilcoxon_signed_rank(df, x_side="y", y_side="x").collect()[0]
    assert fwd["n_obs"] == rev["n_obs"]
    assert fwd["var48"] == rev["var48"]
    # W+ and W- partition the total rank sum; z flips sign exactly
    assert fwd["w2_pos"] + rev["w2_pos"] == fwd["n_obs"] * (fwd["n_obs"] + 1)
    if fwd["z"] is not None:
        assert fwd["z"] == -rev["z"] or (fwd["z"] == 0.0 and rev["z"] == 0.0)
