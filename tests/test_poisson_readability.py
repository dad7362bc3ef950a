"""Moran exponentiality + readability: brute-force parity, planted
regular-vs-exponential arrivals, simple-vs-complex prose separation,
degenerate edges."""

from __future__ import annotations

import datetime as dt
import math
import re

import numpy as np

from tits_spark.operators.poissonness import moran_exponentiality
from tits_spark.operators.readability import readability

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _brute_moran(us_sorted):
    gaps = np.diff(np.asarray(us_sorted, dtype=np.int64))
    pos = gaps[gaps > 0]
    n = len(pos)
    slnq = sum(math.floor(math.log(float(g)) * 1e9) for g in pos)
    sumg = int(pos.sum())
    m = 2.0 * n * (math.log(sumg / n) - slnq / (n * 1e9))
    corr = 1.0 + (n + 1.0) / (6.0 * n)
    return n, int((gaps == 0).sum()), sumg, m, m / corr


def test_moran_brute_force_parity(spark):
    rng = np.random.default_rng(59)
    rows, per_key = [], {}
    for k in range(3):
        us = np.sort(rng.choice(10**9, size=60, replace=False))
        per_key[f"k{k}"] = us
        rows += [
            (f"k{k}", BASE + dt.timedelta(microseconds=int(u))) for u in us
        ]
    got = {
        r["key"]: r for r in moran_exponentiality(_ev(spark, rows)).collect()
    }
    base_us = int(BASE.timestamp()) * 1_000_000
    for k, us in per_key.items():
        n, nz, sumg, m, mc = _brute_moran([base_us + int(u) for u in us])
        assert (got[k]["n_gaps"], got[k]["n_zero"], got[k]["sum_gap_us"]) \
            == (n, nz, sumg)
        assert got[k]["m_stat"] == round(m, 6) + 0.0
        assert got[k]["m_corr"] == round(mc, 6) + 0.0


def test_moran_regular_vs_exponential(spark):
    """A metronome (all gaps equal) has M = 0 exactly; exponential
    arrivals sit near the chi2(n-1) center ~ n."""
    rng = np.random.default_rng(61)
    rows = [
        ("tick", BASE + dt.timedelta(seconds=i * 60)) for i in range(100)
    ]
    t = 0.0
    for _ in range(100):
        t += float(rng.exponential(60.0))
        rows.append(("poisson", BASE + dt.timedelta(seconds=t)))
    out = {
        r["key"]: r for r in moran_exponentiality(_ev(spark, rows)).collect()
    }
    assert out["tick"]["m_stat"] == 0.0
    assert 60.0 < out["poisson"]["m_corr"] < 140.0  # ~chi2(98)
    # burstiness inflates M far beyond the chi2 band
    rows2 = []
    t = 0.0
    for i in range(50):
        t += 1.0 if i % 5 else 3600.0
        rows2.append(("bursty", BASE + dt.timedelta(seconds=t)))
    got = moran_exponentiality(_ev(spark, rows2)).collect()[0]
    assert got["m_corr"] > 140.0


def test_moran_zero_gap_collisions_counted(spark):
    rows = []
    for i in range(12):
        ts = BASE + dt.timedelta(seconds=i * 10)
        rows.append(("dup", ts))
        if i % 3 == 0:
            rows.append(("dup", ts))  # same-microsecond collision
    got = moran_exponentiality(_ev(spark, rows)).collect()[0]
    assert got["n_zero"] == 4
    assert got["n_gaps"] == 11


def _docs(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _brute_read(text):
    ns = max(len(re.findall(r"[.!?]+", text)), 1)
    nw = len([t for t in re.sub(r"[^a-zA-Z0-9]+", " ", text).lower().split() if t])
    sy = len(re.findall(r"[aeiouy]+", text.lower()))
    if nw == 0:
        return ns, nw, sy, None, None
    ease = 206.835 - 1.015 * (nw / ns) - 84.6 * (sy / nw)
    grade = 0.39 * (nw / ns) + 11.8 * (sy / nw) - 15.59
    return ns, nw, sy, round(ease, 4) + 0.0, round(grade, 4) + 0.0


def test_readability_brute_force_parity(spark):
    docs = [
        "The cat sat. The dog ran! Did it rain?",
        "Incomprehensibility characterizes multisyllabic terminology.",
        "short",
        "!!!",
        "Numbers 42 and 7 count as words; x counts zero syllables.",
    ]
    got = {
        r["doc_id"]: (
            r["n_sentences"], r["n_words"], r["n_syllables"],
            r["flesch_ease"], r["fk_grade"],
        )
        for r in readability(_docs(spark, docs)).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _brute_read(t)


def test_readability_orders_simple_before_complex(spark):
    simple = "I like tea. It is hot. We sip it slow. The cup is big."
    dense = (
        "Epistemological considerations notwithstanding, the "
        "instantiation of multidimensional regularization "
        "methodologies necessitates considerable computational "
        "sophistication."
    )
    out = {
        r["doc_id"]: r
        for r in readability(_docs(spark, [simple, dense])).collect()
    }
    assert out[0]["flesch_ease"] > 80.0
    assert out[1]["flesch_ease"] < 0.0
    assert out[0]["fk_grade"] < 4.0 < out[1]["fk_grade"]
