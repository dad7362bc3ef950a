"""PAA/SAX symbolization, discord ranking, gap/uptime intervals."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.matrix_profile import discords, matrix_profile, motifs
from tits_spark.operators.sax import BREAKPOINTS, paa, sax_words
from tits_spark.operators.windows import gap_intervals, uptime_stats


def _mk(spark, series: dict[str, list[float]], step: int = 60):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=step * i), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_paa_exact_split(spark):
    # 8 points, 4 segments -> pairs; z-norm then mean of each pair
    v = [1.0, 3.0, 5.0, 7.0, 9.0, 11.0, 13.0, 15.0]
    df = _mk(spark, {"a": v})
    out = {r["seg"]: r for r in paa(df, segments=4).collect()}
    arr = np.array(v)
    z = (arr - arr.mean()) / arr.std(ddof=1)
    for s in range(4):
        assert out[s]["n_pts"] == 2
        assert out[s]["paa"] == pytest.approx(
            round(float(z[2 * s : 2 * s + 2].mean()), 6), abs=1e-9
        )


def test_paa_uneven_split_and_guards(spark):
    # 10 points into 4 segments: floor(i*4/10) -> sizes 3,2,3,2
    rng = np.random.default_rng(5)
    df = _mk(spark, {
        "a": list(rng.normal(0, 1, 10)),
        "flat": [2.0] * 10,          # zero variance -> dropped
        "tiny": [1.0, 2.0, 3.0],     # shorter than segments -> dropped
    })
    rows = paa(df, segments=4).collect()
    assert {r["key"] for r in rows} == {"a"}
    sizes = {r["seg"]: r["n_pts"] for r in rows}
    assert sizes == {0: 3, 1: 2, 2: 3, 3: 2}


def test_sax_words(spark):
    # a strong ramp: low letters then high letters, monotone word
    ramp = list(np.linspace(0, 100, 32))
    df = _mk(spark, {"up": ramp, "down": ramp[::-1], "up2": ramp})
    words = {r["key"]: r["word"] for r in sax_words(df, segments=8, alphabet=4).collect()}
    assert len(words["up"]) == 8
    assert words["up"] == "".join(sorted(words["up"]))          # non-decreasing
    assert words["down"] == words["up"][::-1]                   # symmetry
    assert words["up2"] == words["up"]                          # join candidate
    assert set(words["up"]) == set("abcd")


def test_sax_alphabet_guard(spark):
    df = _mk(spark, {"a": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError):
        sax_words(df, alphabet=7)
    assert 7 not in BREAKPOINTS


def test_discords_and_motifs_rank(spark):
    rng = np.random.default_rng(9)
    v = np.sin(np.arange(120) * 2 * np.pi / 12) * 10 + rng.normal(0, 0.3, 120)
    v[60:68] += np.array([0, 25, -25, 25, -25, 25, -25, 0])  # planted anomaly
    df = _mk(spark, {"a": list(v)})
    top = discords(df, m=12, k=3).collect()
    assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2, 3]
    # the rank-1 discord window overlaps the planted anomaly
    best = min(top, key=lambda r: r["rank"])
    assert 50 <= best["wi"] <= 68
    # motif ranks are the ascending-mp counterpart of the same profile
    prof = {r["wi"]: r["mp"] for r in matrix_profile(df, m=12).collect()}
    mot = motifs(df, m=12, k=1).collect()[0]
    assert mot["mp"] == min(prof.values())


def test_gap_intervals_and_uptime(spark):
    t0 = dt.datetime(2024, 1, 1)
    offs = [0, 60, 120, 3720, 3780, 3840, 11040]  # two gaps: 3600s, 7200s
    rows = [("a", t0 + dt.timedelta(seconds=s), 1.0) for s in offs]
    rows += [("b", t0, 1.0)]  # single point: no gaps, uptime 1.0
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    gaps = gap_intervals(df, ["key"], "ts", threshold_sec=600.0).collect()
    got = sorted((r["key"], r["gap_sec"]) for r in gaps)
    assert got == [("a", 3600.0), ("a", 7200.0)]
    up = {r["key"]: r for r in uptime_stats(df, ["key"], "ts", 600.0).collect()}
    assert up["a"]["n_gaps"] == 2
    assert up["a"]["downtime_sec"] == 10800.0
    assert up["a"]["uptime_ratio"] == pytest.approx(
        round(1 - 10800.0 / 11040.0, 6), abs=1e-9
    )
    assert up["b"]["n_gaps"] == 0 and up["b"]["uptime_ratio"] == 1.0
