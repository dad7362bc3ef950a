"""Western Electric rules: brute-force replay parity, one planted
pattern per rule (and only that rule's natural fires), baseline
gates."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.western_electric import western_electric

BASE = dt.datetime(2024, 3, 1)
B = 20  # small baseline for tests


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )


def _rows(key, vals):
    return [
        (key, BASE + dt.timedelta(minutes=i), i, float(v))
        for i, v in enumerate(vals)
    ]


def _brute(vals, b=B):
    cents = [round(v * 100) for v in vals]
    if len(cents) <= b:
        return []
    cl = sum(cents[:b]) / float(b)
    mr = sum(abs(cents[i] - cents[i - 1]) for i in range(1, b))
    sig = (mr / float(b - 1)) / 1.128
    if not sig > 0:
        return []
    evs = cents[b:]
    flags = []
    for c in evs:
        d = c - cl
        flags.append(
            dict(
                dev=d,
                up3=d > 3.0 * sig, dn3=d < -3.0 * sig,
                up2=int(d > 2.0 * sig), dn2=int(d < -2.0 * sig),
                up1=int(d > sig), dn1=int(d < -sig),
                up0=int(d > 0), dn0=int(d < 0),
            )
        )
    out = []
    for i, f in enumerate(flags):
        er = i + 1

        def rsum(k, n):
            return sum(flags[j][k] for j in range(max(0, i - n + 1), i + 1))

        r1 = f["up3"] or f["dn3"]
        r2 = er >= 3 and (
            (rsum("up2", 3) >= 2 and f["up2"] == 1)
            or (rsum("dn2", 3) >= 2 and f["dn2"] == 1)
        )
        r3 = er >= 5 and (
            (rsum("up1", 5) >= 4 and f["up1"] == 1)
            or (rsum("dn1", 5) >= 4 and f["dn1"] == 1)
        )
        r4 = er >= 8 and (rsum("up0", 8) == 8 or rsum("dn0", 8) == 8)
        if r1 or r2 or r3 or r4:
            dev6 = float(
                np.sign(f["dev"])
                * math.floor(abs(f["dev"]) * 1e6 + 0.5)
                / 1e6
            ) + 0.0
            out.append((b + i, dev6, r1, r2, r3, r4))
    return out


def test_we_brute_replay_parity(spark):
    rng = np.random.default_rng(2003)
    rows, seqs = [], {}
    for k in range(4):
        # wandering process: plenty of natural rule fires
        steps = rng.normal(0, 0.5, 120)
        vals = np.round(50 + np.cumsum(steps) * 0.4, 2)
        seqs[f"k{k}"] = list(vals)
        rows += _rows(f"k{k}", vals)
    got = western_electric(
        _df(spark, rows), baseline_n=B
    ).orderBy("key", "ts_us").collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    for k, vals in seqs.items():
        want = _brute(vals)
        have = by_key.get(k, [])
        assert len(have) == len(want), (k, len(have), len(want))
        for r, (idx, dev6, r1, r2, r3, r4) in zip(have, want):
            assert r["value"] == vals[idx]
            assert r["dev"] == dev6
            assert (r["r1"], r["r2"], r["r3"], r["r4"]) == (
                r1, r2, r3, r4,
            )


def test_we_planted_rules(spark):
    base = [50.0 + (0.2 if i % 2 else -0.2) for i in range(B)]
    # rule 1: single huge spike
    v1 = base + [50.0, 50.0, 58.0, 50.0]
    r = western_electric(_df(spark, _rows("a", v1)), baseline_n=B).collect()
    assert len(r) == 1 and r[0]["r1"] and r[0]["value"] == 58.0
    # rule 4: 8 consecutive slightly-above points (within 1 sigma)
    sig = (0.4 * 100 * (B - 1) / (B - 1) / (B - 1)) / 1.128  # cents
    v4 = base + [50.05] * 8
    r = western_electric(_df(spark, _rows("d", v4)), baseline_n=B).collect()
    fires = [x for x in r if x["r4"]]
    assert len(fires) == 1 and fires[0]["value"] == 50.05
    assert not any(x["r1"] for x in r)


def test_we_gates(spark):
    # exactly baseline_n rows: no evaluation rows -> empty
    base = [50.0 + (0.1 if i % 2 else -0.1) for i in range(B)]
    assert (
        western_electric(_df(spark, _rows("g", base)), baseline_n=B)
        .collect()
        == []
    )
    # constant baseline: sigma == 0 -> degenerate, nothing evaluated
    flat = [50.0] * (B + 10)
    assert (
        western_electric(_df(spark, _rows("f", flat)), baseline_n=B)
        .collect()
        == []
    )
