"""Log-rank: brute-force parity against a hand-rolled Mantel-Cox
reference, planted hazard separation, empty-arm pole."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.logrank import logrank_ampm

BASE = dt.datetime(2024, 5, 1)  # one cohort month


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    )


def _subject(uid, entry_hour, dur_days, converted):
    """Entry view at BASE+entry_hour; purchase (or just a trailing
    click = censor) dur_days later."""
    entry = BASE + dt.timedelta(hours=entry_hour)
    endt = entry + dt.timedelta(days=dur_days)
    rows = [(uid, entry, "view")]
    rows.append((uid, endt, "purchase" if converted else "click"))
    return rows


def _brute(subjects):
    """subjects: (am, dur_us, evt)."""
    times = sorted({d for _, d, e in subjects if e})
    o1 = sum(e for am, _, e in subjects if am)
    e1q = vq = 0
    for t in times:
        d1 = sum(1 for am, d, e in subjects if am and e and d == t)
        d2 = sum(1 for am, d, e in subjects if not am and e and d == t)
        n1t = sum(1 for am, d, _ in subjects if am and d >= t)
        n2t = sum(1 for am, d, _ in subjects if not am and d >= t)
        d_, nt = d1 + d2, n1t + n2t
        if d_ > 0 and nt > 1:
            e1q += math.floor(1e9 * (d_ * n1t / nt))
            vq += math.floor(
                1e6 * (d_ * n1t * n2t * (nt - d_) / (nt * nt * (nt - 1)))
            )
    e1 = e1q / 1e9
    chi2 = (
        round((o1 - e1) * (o1 - e1) / (vq / 1e6), 6) + 0.0 if vq > 0 else None
    )
    return o1, e1q, vq, chi2


def test_logrank_brute_force_parity(spark):
    rng = np.random.default_rng(127)
    rows, subjects = [], []
    for u in range(40):
        am = u % 2 == 0
        hour = int(rng.integers(0, 12)) if am else int(rng.integers(12, 24))
        dur = int(rng.integers(1, 15))
        conv = bool(rng.random() < (0.8 if am else 0.4))
        rows += _subject(f"u{u}", hour, dur, conv)
        subjects.append((am, dur * 86_400_000_000, 1 if conv else 0))
    got = logrank_ampm(_ev(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    o1, e1q, vq, chi2 = _brute(subjects)
    assert (r["n1"], r["n2"]) == (20, 20)
    assert r["o1"] == o1
    assert (r["e1q"], r["vq"]) == (e1q, vq)
    assert r["chi2"] == chi2


def test_logrank_separates_hazards(spark):
    """AM users all convert fast, PM users never convert: chi2 blows
    up; with IDENTICAL arms chi2 ~ 0."""
    rows_sep, rows_same = [], []
    for u in range(30):
        am = u % 2 == 0
        hour = 3 if am else 15
        rows_sep += _subject(f"s{u}", hour, 2 if am else 20, am)
        rows_same += _subject(f"e{u}", hour, 5, u % 4 < 2)
    sep = logrank_ampm(_ev(spark, rows_sep)).collect()[0]
    same = logrank_ampm(_ev(spark, rows_same)).collect()[0]
    assert sep["chi2"] > 10.0
    assert same["chi2"] is not None and same["chi2"] < 1.0


def test_logrank_empty_arm_pole(spark):
    """All entries AM: V = 0 at every time -> chi2 NULL."""
    rows = []
    for u in range(10):
        rows += _subject(f"a{u}", 5, u + 1, True)
    r = logrank_ampm(_ev(spark, rows)).collect()[0]
    assert r["n2"] == 0
    assert r["vq"] == 0 and r["chi2"] is None
