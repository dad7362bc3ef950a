"""Isotonic hourly calibration: brute-force weighted PAVA parity on
the exact integer lattice, monotone output, idempotence on already-
monotone profiles, negative-value floor semantics."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.isotonic import isotonic_hourly

BASE = dt.datetime(2024, 7, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _mk(key, per_hour):
    """per_hour: dict hour -> list of values."""
    out = []
    for h, vals in per_hour.items():
        for i, v in enumerate(vals):
            out.append(
                (key, BASE + dt.timedelta(hours=h, seconds=i), float(v))
            )
    return out


def _pava(per_hour):
    """Weighted PAVA over exact integer (sum_cents, n) blocks; returns
    {hour: fit_micro} with fit_micro = (1e6 * S_block) // N_block."""
    hours = sorted(per_hour)
    blocks = []  # [hours, S, N]
    for h in hours:
        cents = [round(v * 100) for v in per_hour[h]]
        blocks.append([[h], sum(cents), len(cents)])
        # pool while the last block average < previous block average
        while len(blocks) > 1 and (
            blocks[-1][1] * blocks[-2][2] < blocks[-2][1] * blocks[-1][2]
        ):
            hs, s, n = blocks.pop()
            blocks[-1][0] += hs
            blocks[-1][1] += s
            blocks[-1][2] += n
    out = {}
    for hs, s, n in blocks:
        for h in hs:
            out[h] = (10**6 * s) // n
    return out


def test_isotonic_brute_force_pava_parity(spark):
    rng = np.random.default_rng(509)
    rows, keys = [], {}
    for k in range(4):
        per_hour = {
            int(h): [
                float(v)
                for v in np.round(rng.normal(50 + 0.5 * h, 10, 5), 2)
            ]
            for h in rng.choice(24, size=12, replace=False)
        }
        keys[f"k{k}"] = per_hour
        rows += _mk(f"k{k}", per_hour)
    got = {
        (r["key"], r["hour"]): r
        for r in isotonic_hourly(_df(spark, rows)).collect()
    }
    for k, per_hour in keys.items():
        want = _pava(per_hour)
        assert {h: got[(k, h)]["fit_micro"] for h in per_hour} == want
        # raw means too
        for h, vals in per_hour.items():
            cents = [round(v * 100) for v in vals]
            assert got[(k, h)]["raw_micro"] == (
                10**6 * sum(cents)
            ) // len(cents)
            assert got[(k, h)]["n_obs"] == len(vals)


def test_isotonic_monotone_and_idempotent(spark):
    dec = {h: [100.0 - h] for h in range(24)}  # strictly decreasing
    inc = {h: [10.0 + 2 * h] for h in range(24)}  # already monotone
    rows = _mk("dec", dec) + _mk("inc", inc)
    got = isotonic_hourly(_df(spark, rows)).collect()
    by = {}
    for r in got:
        by.setdefault(r["key"], {})[r["hour"]] = r
    # decreasing input pools to one flat block at the global mean
    fits = [by["dec"][h]["fit_micro"] for h in range(24)]
    assert len(set(fits)) == 1
    assert fits[0] == (10**6 * sum(round((100.0 - h) * 100) for h in range(24))) // 24
    # monotone input is a fixed point: fit == raw everywhere
    for h in range(24):
        r = by["inc"][h]
        assert r["fit_micro"] == r["raw_micro"]
    assert all(
        by["inc"][h]["fit_micro"] <= by["inc"][h + 1]["fit_micro"]
        for h in range(23)
    )


def test_isotonic_negative_values_floor(spark):
    # negative cents exercise floor (not truncate) division: -3 cents
    # over 2 obs -> floor(-1.5e6) = -1500000
    rows = _mk("neg", {5: [-0.01, -0.02]})
    r = isotonic_hourly(_df(spark, rows)).collect()[0]
    assert r["raw_micro"] == r["fit_micro"] == -1_500_000
