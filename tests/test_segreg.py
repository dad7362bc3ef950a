from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.segreg import segmented_fit


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _rows(key, vals):
    return [
        (key, BASE + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)
    ]


def test_segreg_recovers_planted_break(spark):
    # slope +2 cents/step for 40 points, then slope -3 cents/step
    up = [1.0 + 0.02 * i for i in range(40)]
    down = [up[-1] - 0.03 * (i + 1) for i in range(40)]
    out = segmented_fit(_mk(spark, _rows("k", up + down))).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 80
    assert abs(r.brk - 40) <= 1
    assert r.slope_l_u6 == pytest.approx(2_000_000, abs=150_000)
    assert r.slope_r_u6 == pytest.approx(-3_000_000, abs=150_000)
    # a genuine break: pooled SSE far below the single-line SSE
    assert r.sse_ratio_u6 < 200_000


def test_segreg_pure_line_has_ratio_near_one(spark):
    line = [10.0 + 0.05 * i for i in range(60)]
    r = segmented_fit(_mk(spark, _rows("k", line))).collect()[0]
    # exact line: both models fit perfectly; ratio is NULL (sse1 == 0)
    # or ~1e6 depending on cents rounding residue
    assert r.sse_ratio_u6 is None or r.sse_ratio_u6 >= 0
    assert r.slope_l_u6 == pytest.approx(5_000_000, abs=100_000)


def test_segreg_noise_matches_numpy_argmin(spark):
    rng = np.random.default_rng(9)
    vals = np.round(rng.normal(50, 3, 40), 2)
    r = segmented_fit(_mk(spark, _rows("k", vals)), min_seg=3).collect()[0]
    y = np.round(vals * 100).astype(np.int64)
    x = np.arange(1, 41, dtype=np.int64)

    def sse(xs, ys):
        n = len(xs)
        vxx = float(n * (xs * xs).sum() - xs.sum() ** 2)
        vxy = float(n * (xs * ys).sum() - xs.sum() * ys.sum())
        vyy = float(n * (ys * ys).sum() - ys.sum() ** 2)
        return (vyy - vxy * vxy / vxx) / n

    cands = {
        i: sse(x[:i], y[:i]) + sse(x[i:], y[i:]) for i in range(3, 38)
    }
    want = min(cands, key=lambda i: (cands[i], i))
    assert r.brk == want


def test_segmented_fit_rejects_min_seg_below_two(spark, events):
    import pytest

    from tits_spark.operators.segreg import segmented_fit

    with pytest.raises(ValueError, match="min_seg"):
        segmented_fit(events, min_seg=1)
