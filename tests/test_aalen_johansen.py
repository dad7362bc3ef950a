"""Aalen-Johansen: brute-force replay parity, the AJ identity
CIF_a + CIF_b + S = 1, competing-risk bias demonstration (naive
1-KM-with-other-cause-censored overstates incidence), tie rule."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

import numpy as np

from tits_spark.operators.survival import aalen_johansen

BASE = dt.datetime(2024, 1, 5)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    )


def _brute(subjects):
    """subjects: list of (dur, kind) with kind in {a, b, c}.
    Replays the grid exactly like the operator."""
    grid = defaultdict(lambda: [0, 0, 0])
    for dur, kind in subjects:
        grid[dur]["abc".index(kind)] += 1
    total = len(subjects)
    out = []
    seen = 0
    s = 1.0
    log_s = 0.0
    hit = False
    cif_a = cif_b = 0.0
    for dur in sorted(grid):
        da, db, cen = grid[dur]
        n = total - seen
        seen += da + db + cen
        sprev = 0.0 if hit else math.exp(log_s)
        cif_a += sprev * (da / n)
        cif_b += sprev * (db / n)
        d = da + db
        if d == n:
            hit = True
        elif d < n:
            log_s += math.log(1.0 - d / n)
        s_out = 0.0 if hit else _r6(math.exp(log_s))
        out.append(
            (dur, n, da, db, cen, round(s_out, 6),
             _r6(cif_a), _r6(cif_b))
        )
    return out


def _rows_from_subjects(subjects):
    """Build event rows: every subject views at entry; kind a/b adds
    that event at entry+dur; censored subjects get a click there."""
    rows = []
    for i, (dur, kind) in enumerate(subjects):
        k = f"u{i}"
        rows.append((k, BASE, "view"))
        t = BASE + dt.timedelta(microseconds=dur)
        if kind == "a":
            rows.append((k, t, "purchase"))
        elif kind == "b":
            rows.append((k, t, "error"))
        else:
            rows.append((k, t, "click"))
    return rows


def test_aj_brute_parity_and_identity(spark):
    rng = np.random.default_rng(2103)
    subjects = []
    for _ in range(120):
        dur = int(rng.integers(1, 40)) * 1_000_000
        kind = rng.choice(["a", "b", "c"], p=[0.4, 0.3, 0.3])
        subjects.append((dur, str(kind)))
    got = (
        aalen_johansen(_df(spark, _rows_from_subjects(subjects)))
        .orderBy("dur_us")
        .collect()
    )
    want = _brute(subjects)
    assert len(got) == len(want)
    for r, (dur, n, da, db, cen, s, ca, cb) in zip(got, want):
        assert (
            r["dur_us"], r["n_risk"], r["d_a"], r["d_b"], r["censored"],
        ) == (dur, n, da, db, cen)
        assert abs(r["survival"] - s) <= 1e-6
        assert abs(r["cif_a"] - ca) <= 1e-6
        assert abs(r["cif_b"] - cb) <= 1e-6
        # the AJ decomposition identity at every grid point
        assert abs(r["survival"] + r["cif_a"] + r["cif_b"] - 1.0) < 5e-6


def test_aj_beats_naive_km_complement(spark):
    """With heavy competing cause b, CIF_a must sit BELOW the naive
    1 - KM_a (other cause censored): the textbook bias direction."""
    rng = np.random.default_rng(2111)
    subjects = []
    for _ in range(200):
        dur = int(rng.integers(1, 30)) * 1_000_000
        kind = str(rng.choice(["a", "b"], p=[0.3, 0.7]))
        subjects.append((dur, kind))
    got = (
        aalen_johansen(_df(spark, _rows_from_subjects(subjects)))
        .orderBy("dur_us")
        .collect()
    )
    last = got[-1]
    # naive: treat b as censoring -> KM complement for cause a
    s = 1.0
    seen = 0
    grid = defaultdict(lambda: [0, 0])
    for dur, kind in subjects:
        grid[dur]["ab".index(kind)] += 1
    n_tot = len(subjects)
    for dur in sorted(grid):
        da, db = grid[dur]
        n = n_tot - seen
        seen += da + db
        if da and da < n:
            s *= 1.0 - da / n
        elif da and da == n:
            s = 0.0
    naive = 1.0 - s
    assert last["cif_a"] < naive - 0.05
    assert last["cif_a"] + last["cif_b"] > 0.99  # everyone fails


def test_aj_exact_us_tie_resolves_to_cause_a(spark):
    rows = [
        ("u0", BASE, "view"),
        ("u0", BASE + dt.timedelta(seconds=5), "purchase"),
        ("u0", BASE + dt.timedelta(seconds=5), "error"),
        ("u1", BASE, "view"),
        ("u1", BASE + dt.timedelta(seconds=9), "click"),
    ]
    got = aalen_johansen(_df(spark, rows)).orderBy("dur_us").collect()
    assert got[0]["d_a"] == 1 and got[0]["d_b"] == 0
    assert got[1]["censored"] == 1
