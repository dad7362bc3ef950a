"""Agreement suite: brute-force parity for transition kappa, Bowker
symmetry and Krippendorff m=2 alpha; planted perfect-agreement /
perfect-symmetry cases; degenerate gates."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import numpy as np

from tits_spark.operators.agreement import (
    bowker_symmetry,
    krippendorff_m2,
    transition_kappa,
)

BASE = dt.datetime(2024, 3, 1)


def _r6(v):
    """Half-away-from-zero round to 6 (Spark F.round / DuckDB round);
    Python's built-in round is half-even and disagrees on exact .5s."""
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, event_type string"
    )


def _rows(key, seq, start=0, step_min=7):
    return [
        (key, BASE + dt.timedelta(minutes=start + i * step_min), i, s)
        for i, s in enumerate(seq)
    ]


def _brute_kappa(seq):
    pairs = list(zip(seq, seq[1:]))
    n = len(pairs)
    d = sum(1 for a, b in pairs if a == b)
    row = Counter(a for a, _ in pairs)
    col = Counter(b for _, b in pairs)
    pe = sum(row[t] * col[t] for t in set(row) | set(col))
    if n * n == pe:
        return n, d, pe, None
    return n, d, pe, _r6((n * d - pe) / (n * n - pe))


def _brute_bowker(seq):
    pairs = Counter(zip(seq, seq[1:]))
    seen = set()
    df_ = 0
    q = 0
    for (a, b) in list(pairs):
        if a == b or (b, a) in seen:
            continue
        seen.add((a, b))
        nf, nr = pairs[(a, b)], pairs[(b, a)]
        s = nf + nr
        if s > 0:
            df_ += 1
            q += math.floor(
                1e6 * (float(nf - nr) * float(nf - nr)) / float(s)
            )
    return df_, q, _r6(q / 1e6)


def _brute_alpha(day_pairs):
    n = len(day_pairs)
    u = sum(1 for a, b in day_pairs if a != b)
    vals = Counter()
    for a, b in day_pairs:
        vals[a] += 1
        vals[b] += 1
    tot = 2 * n
    cross = tot * tot - sum(c * c for c in vals.values())
    if cross == 0:
        return n, u, cross, None
    return n, u, cross, _r6(1.0 - (2 * n - 1) * 2 * u / cross)


def test_kappa_bowker_brute_parity(spark):
    rng = np.random.default_rng(1409)
    types = ["a", "b", "c", "d"]
    rows, seqs = [], {}
    for k in range(4):
        seq = [types[i] for i in rng.integers(0, 4, 60)]
        seqs[f"k{k}"] = seq
        rows += _rows(f"k{k}", seq)
    kap = {r["key"]: r for r in transition_kappa(_df(spark, rows)).collect()}
    bow = {r["key"]: r for r in bowker_symmetry(_df(spark, rows)).collect()}
    for k, seq in seqs.items():
        n, d, pe, kv = _brute_kappa(seq)
        r = kap[k]
        assert (r["n_trans"], r["n_agree"], r["pe_mass"]) == (n, d, pe)
        assert r["kappa"] == kv
        df_, q, chi2 = _brute_bowker(seq)
        rb = bow[k]
        assert (rb["n_trans"], rb["bowker_df"], rb["chi2q_ppm"]) == (
            n, df_, q,
        )
        assert rb["chi2"] == chi2


def test_kappa_planted_extremes(spark):
    # perfect one-step agreement: constant runs -> kappa undefined
    # (single category); alternating two-type cycle -> zero agreement
    seq_alt = ["x", "y"] * 30
    rows = _rows("alt", seq_alt)
    r = transition_kappa(_df(spark, rows)).collect()[0]
    assert r["n_agree"] == 0 and r["kappa"] < 0
    # block sequence: long runs of each type -> high kappa
    seq_blk = ["x"] * 30 + ["y"] * 30 + ["z"] * 30
    rb = transition_kappa(_df(spark, _rows("blk", seq_blk))).collect()[0]
    assert rb["kappa"] > 0.9


def test_bowker_symmetric_matrix_is_zero(spark):
    # a->b exactly as often as b->a: chi2 == 0, df == pairs with mass
    seq = ["a", "b"] * 20 + ["a", "c"] * 20 + ["a"]
    r = bowker_symmetry(_df(spark, _rows("s", seq))).collect()[0]
    # transitions: a->b 20, b->a 20 (incl wrap backs)... verify vs brute
    df_, q, chi2 = _brute_bowker(seq)
    assert (r["bowker_df"], r["chi2q_ppm"], r["chi2"]) == (df_, q, chi2)


def test_krippendorff_brute_parity_and_gates(spark):
    rng = np.random.default_rng(1423)
    types = ["a", "b", "c"]
    rows, days = [], {}
    for k in range(3):
        dp = []
        for d in range(12):
            m = int(rng.integers(1, 5))  # some days have 1 event: not pairable
            evs = [types[i] for i in rng.integers(0, 3, m)]
            if m >= 2:
                dp.append((evs[0], evs[1]))
            for i, t in enumerate(evs):
                rows.append(
                    (
                        f"k{k}",
                        BASE + dt.timedelta(days=d, minutes=5 * i),
                        d * 10 + i,
                        t,
                    )
                )
        days[f"k{k}"] = dp
    got = {r["key"]: r for r in krippendorff_m2(_df(spark, rows)).collect()}
    for k, dp in days.items():
        n, u, cross, alpha = _brute_alpha(dp)
        if n < 5:
            assert k not in got
            continue
        r = got[k]
        assert (r["n_units"], r["n_disagree"], r["cross_mass"]) == (
            n, u, cross,
        )
        assert r["alpha"] == alpha


def test_krippendorff_perfect_agreement(spark):
    rows = []
    for d in range(8):
        t = ["a", "b"][d % 2]
        rows.append(("k", BASE + dt.timedelta(days=d), d * 2, t))
        rows.append(
            ("k", BASE + dt.timedelta(days=d, minutes=1), d * 2 + 1, t)
        )
    r = krippendorff_m2(_df(spark, rows)).collect()[0]
    assert r["n_disagree"] == 0 and r["alpha"] == 1.0


def _brute_ac1(seq):
    pairs = list(zip(seq, seq[1:]))
    n = len(pairs)
    d = sum(1 for a, b in pairs if a == b)
    m = Counter()
    for a, b in pairs:
        m[a] += 1
        m[b] += 1
    k = len(m)
    g1 = sum(mk * (2 * n - mk) for mk in m.values())
    num = 4 * n * (k - 1) * d - g1
    den = 4 * n * n * (k - 1) - g1
    if den == 0:
        return n, d, k, g1, None
    return n, d, k, g1, _r6(num / den)


def test_gwet_ac1_brute_parity_and_paradox(spark):
    from tits_spark.operators.agreement import transition_gwet_ac1

    rng = np.random.default_rng(1451)
    types = ["a", "b", "c"]
    rows, seqs = [], {}
    for k in range(3):
        seq = [types[i] for i in rng.integers(0, 3, 50)]
        seqs[f"k{k}"] = seq
        rows += _rows(f"k{k}", seq)
    # the kappa paradox plant: 96% one category, high raw agreement
    para = (["x"] * 12 + ["y"]) * 4 + ["x"] * 8
    seqs["para"] = para
    rows += _rows("para", para)
    got = {
        r["key"]: r for r in transition_gwet_ac1(_df(spark, rows)).collect()
    }
    for k, seq in seqs.items():
        n, d, kc, g1, ac1 = _brute_ac1(seq)
        r = got[k]
        assert (r["n_trans"], r["n_agree"], r["k_cats"], r["g1_mass"]) == (
            n, d, kc, g1,
        )
        assert r["ac1"] == ac1
    # paradox direction: AC1 stays near the raw agreement rate while
    # kappa is pulled toward zero by the skewed marginals
    n, d, _pe, kv = _brute_kappa(para)
    assert got["para"]["ac1"] > kv + 0.2
    assert got["para"]["ac1"] > 0.5
