"""Burrows Delta: brute-force parity on the exact quantized
definition, stylistic-outlier detection, the marker-free-doc
telescope, and the zero-variance marker drop."""

from __future__ import annotations

import math
from collections import Counter

from tits_spark.operators.stylometry import burrows_delta


def _mk(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _tok(text):
    import re

    return [t for t in re.sub(r"[^a-zA-Z0-9]+", " ", text).lower().split(" ") if t]


def _brute(docs, k=50):
    toks = {i: _tok(t) for i, t in enumerate(docs)}
    toks = {i: w for i, w in toks.items() if w}
    n = len(toks)
    ctf = Counter()
    for w in toks.values():
        ctf.update(w)
    top = sorted(ctf, key=lambda t: (-ctf[t], t))[:k]
    fq = {
        (i, t): math.floor(1e9 * c / len(w))
        for i, w in toks.items()
        for t, c in Counter(w).items()
        if t in set(top)
    }
    out = {}
    stats = {}
    for t in top:
        s = sum(fq.get((i, t), 0) for i in toks)
        q = sum(fq.get((i, t), 0) ** 2 for i in toks)
        var = n * q - s * s
        if var > 0:
            stats[t] = (s, var, math.floor(1e9 * s / math.sqrt(var)))
    k_eff = len(stats)
    z0_total = sum(z0q for _, _, z0q in stats.values())
    for i, w in toks.items():
        sq = 0
        n_present = 0
        for t, (s, var, z0q) in stats.items():
            if (i, t) in fq:
                n_present += 1
                z = abs(float(n * fq[(i, t)] - s) / math.sqrt(var))
                sq += math.floor(1e9 * (z - z0q / 1e9))
        out[i] = (
            len(w),
            n_present,
            math.floor((sq + z0_total) / (k_eff * 1000.0)),
        )
    return out


def test_brute_force_parity(spark):
    import numpy as np

    rng = np.random.default_rng(41)
    vocab = ["the", "a", "of", "to", "run", "jump", "data", "model",
             "spark", "query"]
    docs = []
    for _ in range(12):
        ln = int(rng.integers(8, 40))
        probs = rng.dirichlet(np.ones(len(vocab)))
        docs.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_present"], r["delta_u6"])
        for r in burrows_delta(_mk(spark, docs), k_markers=6).collect()
    }
    assert got == _brute(docs, k=6)


def test_outlier_template_scores_high(spark):
    # 20 "normal" docs share a mixed function-word style; one template
    # doc hammers a single marker word
    docs = [
        f"the quick data model ran to the spark query of run {i}"
        for i in range(20)
    ]
    docs.append("spam spam spam spam spam the spam spam spam spam spam")
    out = {
        r["doc_id"]: r["delta_u6"]
        for r in burrows_delta(_mk(spark, docs), k_markers=8).collect()
    }
    spam_id = len(docs) - 1
    normal_max = max(v for k, v in out.items() if k != spam_id)
    assert out[spam_id] > 2 * normal_max


def test_marker_free_doc_scores_z0_over_k(spark):
    docs = [
        "alpha alpha beta gamma", "alpha beta beta gamma",
        "alpha gamma gamma beta", "delta epsilon zeta eta",
    ]
    # k=2 markers: alpha & beta (or gamma) — doc 3 contains none
    res = burrows_delta(_mk(spark, docs), k_markers=2).collect()
    out = {r["doc_id"]: r for r in res}
    assert out[3]["n_present"] == 0
    assert out[3]["delta_u6"] > 0  # sits at exactly Z0/k_eff


def test_zero_variance_marker_dropped(spark):
    # "x" appears with IDENTICAL relative frequency (1/2) in every doc
    # -> zero variance -> dropped from the marker set
    docs = ["x y", "x z", "x w", "x v"]
    res = burrows_delta(_mk(spark, docs), k_markers=1).collect()
    # k_markers=1 picks "x" (top by count), which is then dropped:
    # k_eff = 0 -> delta division by zero would NULL; accept either an
    # all-null delta or empty-stats behavior, but rows must survive
    assert len(res) == 4
    assert all(r["delta_u6"] is None for r in res)
