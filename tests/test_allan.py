from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.allan import allan_variance


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_allan_matches_numpy_reference(spark):
    # one sample per hour -> every daily bin is present and adjacent
    rng = np.random.default_rng(3)
    vals = rng.normal(100, 5, size=24 * 16).round(2)
    rows = [
        ("k", BASE + dt.timedelta(hours=i), float(v)) for i, v in enumerate(vals)
    ]
    out = {
        (r.tau_s): r
        for r in allan_variance(_mk(spark, rows), base_tau_s=86400, n_octaves=3).collect()
    }
    cents = np.round(vals * 100).astype(np.int64)
    epoch_s = np.array(
        [(BASE + dt.timedelta(hours=i) - dt.datetime(1970, 1, 1)).total_seconds() for i in range(len(vals))]
    )
    for tau in (86400, 172800, 345600):
        # bins are ABSOLUTE epoch buckets (2024-01-01 is an odd day
        # index, so 2d bins do not align with the series start)
        b = (epoch_s // tau).astype(np.int64)
        uniq = np.unique(b)
        means = np.array([cents[b == u].sum() / (b == u).sum() for u in uniq])
        adj = np.diff(uniq) == 1
        q = np.floor(np.diff(means)[adj] * 10000.0).astype(np.int64)
        expect = int(np.floor((q.astype(object) ** 2).sum() / (2.0 * len(q))))
        got = out[tau]
        assert got.n_pairs == len(q)
        assert got.avar_q == expect


def test_allan_skips_nonadjacent_bins(spark):
    # two observations a week apart: no adjacent daily bins -> the key
    # contributes no pairs at tau=1d (and none at 2d either)
    rows = [("k", BASE, 10.0), ("k", BASE + dt.timedelta(days=7), 20.0)]
    out = allan_variance(_mk(spark, rows), base_tau_s=86400, n_octaves=2).collect()
    assert out == []


def test_allan_white_noise_flat_in_tau(spark):
    # white noise: AVAR(tau) ~ sigma^2/m halves per octave (m doubles);
    # assert the monotone decrease rather than the exact 2x (finite n)
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 100, size=24 * 32).round(2)
    rows = [
        ("k", BASE + dt.timedelta(hours=i), float(v)) for i, v in enumerate(vals)
    ]
    out = {
        r.tau_s: r.avar_q
        for r in allan_variance(_mk(spark, rows), base_tau_s=86400, n_octaves=3).collect()
    }
    assert out[86400] > out[172800] > out[345600]
