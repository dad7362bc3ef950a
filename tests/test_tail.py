from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from tits_spark.operators.tail import hill_tail


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_hill_recovers_pareto_exponent(spark):
    # exact Pareto(alpha) sample via inverse CDF on a uniform grid:
    # x = (1 - u)^(-1/alpha); Hill on the top-k must land near alpha
    for alpha in (1.5, 3.0):
        n = 2000
        u = (np.arange(n) + 0.5) / n
        x = (1 - u) ** (-1.0 / alpha)
        rows = [
            (f"a{alpha}", BASE + dt.timedelta(seconds=i), float(v))
            for i, v in enumerate(x)
        ]
        out = hill_tail(_mk(spark, rows), k=200).collect()
        assert len(out) == 1
        assert out[0].n_pos == n
        assert out[0].alpha == pytest.approx(alpha, rel=0.15)


def test_hill_matches_closed_form(spark):
    rng = np.random.default_rng(2)
    vals = rng.lognormal(0, 1, 300)
    rows = [
        ("k", BASE + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(vals)
    ]
    out = hill_tail(_mk(spark, rows), k=50).collect()[0]
    top = np.sort(vals)[::-1]
    h = float(np.mean(np.log(top[:50])) - math.log(top[50]))
    assert out.hill == pytest.approx(h, abs=1e-5)
    assert out.alpha == pytest.approx(1 / h, abs=1e-4)


def test_hill_short_and_nonpositive_keys_drop(spark):
    rows = [("s", BASE + dt.timedelta(seconds=i), float(i + 1)) for i in range(20)]
    rows += [("z", BASE + dt.timedelta(seconds=i), -1.0) for i in range(100)]
    out = hill_tail(_mk(spark, rows), k=50).collect()
    assert out == []  # s: < k+1 positives; z: no positives at all
