"""BNS jumps: numpy brute-force parity, planted-jump separation,
dup-timestamp determinism and the min_returns drop rule."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.jumps import bns_jumps

BASE = dt.datetime(2024, 1, 1)


def _rows(key, cents, sec_step=60):
    return [
        (key, BASE + dt.timedelta(seconds=i * sec_step), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(cents):
    c = np.asarray(cents, dtype=np.int64)
    r = np.diff(c)
    a = np.abs(r)
    rv = int((r * r).sum())
    bv = int((a[1:] * a[:-1]).sum())
    rj = (float(rv) - math.pi / 2 * float(bv)) / float(rv)
    return rv, bv, rj


def test_brute_force_parity(spark):
    rng = np.random.default_rng(5)
    cents = 50000 + np.cumsum(rng.integers(-200, 201, size=40))
    out = bns_jumps(_mk(spark, _rows("a", cents)), min_returns=5).collect()
    assert len(out) == 1
    rv, bv, rj = _brute(cents)
    r = out[0]
    assert (r["n_ret"], r["rv"], r["bv_raw"]) == (39, rv, bv)
    assert abs(r["rj"] - rj) < 1e-6


def test_planted_jump_raises_rj(spark):
    rng = np.random.default_rng(9)
    smooth = 50000 + np.cumsum(rng.integers(-100, 101, size=60))
    jumpy = smooth.copy()
    jumpy[30:] += 20000  # one 200-unit jump
    df = _mk(spark, _rows("s", smooth) + _rows("j", jumpy))
    out = {r["key"]: r for r in bns_jumps(df, min_returns=5).collect()}
    assert out["j"]["rj"] > out["s"]["rj"] + 0.5
    assert out["j"]["rj"] > 0.8  # the jump dominates RV but not BV


def test_dup_timestamp_max_cents_rule(spark):
    # two ticks at the same us: the larger cents value wins, so the
    # return series is 100 -> 300 -> 200 ... computed off the max
    rows = _rows("a", [100, 300], sec_step=0)  # same timestamp
    rows += _rows("b", [0], 1)  # pad: distinct key ignored by filter
    rows += [("a", BASE + dt.timedelta(seconds=i + 1), 2.0 + i * 0.1)
             for i in range(21)]
    out = bns_jumps(_mk(spark, rows), min_returns=5).collect()
    assert len(out) == 1 and out[0]["key"] == "a"
    # first return: 200 - 300 = -100 (dedup kept 300, not 100)
    assert out[0]["n_ret"] == 21


def test_min_returns_drop(spark):
    df = _mk(spark, _rows("short", [100, 200, 300]))
    assert bns_jumps(df, min_returns=20).count() == 0
