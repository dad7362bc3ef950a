"""Sample entropy: brute-force parity, regular-vs-random separation,
all-match degenerate pole."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.sampen import sample_entropy

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, counts_by_key):
    rows = []
    for key, counts in counts_by_key.items():
        for day, c in enumerate(counts):
            rows += [
                (key, BASE + dt.timedelta(days=day, minutes=m)) for m in range(c)
            ]
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _brute(counts):
    x = list(counts)
    n = len(x)
    order = sorted(range(n), key=lambda i: (x[i], i))
    q1 = x[order[n // 4 - 1]]
    q3 = x[order[(3 * n) // 4 - 1]]
    r = max(1, (q3 - q1) // 4)
    idx = range(n - 1)
    b = sum(
        1 for i in idx for j in idx if i < j and abs(x[i] - x[j]) <= r
    )
    a = sum(
        1
        for i in idx
        for j in idx
        if i < j and abs(x[i] - x[j]) <= r and abs(x[i + 1] - x[j + 1]) <= r
    )
    se = round(-math.log(a / b), 6) + 0.0 if a and b else None
    return n, r, b, a, se


def test_sampen_brute_force_parity(spark):
    rng = np.random.default_rng(109)
    data = {
        f"k{k}": [int(c) for c in rng.integers(0, 30, 40)] for k in range(3)
    }
    # ensure day 0 and the last day are observed so the spine matches
    for counts in data.values():
        counts[0] = max(counts[0], 1)
        counts[-1] = max(counts[-1], 1)
    got = {r["key"]: r for r in sample_entropy(_ev(spark, data)).collect()}
    for k, counts in data.items():
        n, r, b, a, se = _brute(counts)
        row = got[k]
        assert (row["n_days"], row["r_tol"], row["b_pairs"], row["a_pairs"]) \
            == (n, r, b, a), k
        assert row["sampen"] == se


def test_sampen_regular_vs_random(spark):
    rng = np.random.default_rng(113)
    period = [5, 20] * 20                       # metronome
    noise = [int(c) for c in rng.integers(0, 60, 40)]
    noise[0] = max(noise[0], 1)
    noise[-1] = max(noise[-1], 1)
    got = {
        r["key"]: r
        for r in sample_entropy(
            _ev(spark, {"reg": period, "rnd": noise})
        ).collect()
    }
    # the alternating series repeats its templates perfectly: every
    # m=1 match extends to m=2 -> sampen == 0
    assert got["reg"]["sampen"] == 0.0
    assert got["rnd"]["sampen"] > 0.3


def test_sampen_constant_all_match(spark):
    const = [7] * 25
    r = sample_entropy(_ev(spark, {"c": const})).collect()[0]
    n_t = 24  # templates (last day has no successor)
    assert r["b_pairs"] == n_t * (n_t - 1) // 2
    assert r["a_pairs"] == r["b_pairs"]
    assert r["sampen"] == 0.0
