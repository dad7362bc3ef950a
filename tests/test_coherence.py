"""Embedding label coherence: numpy brute-force parity on the exact
quantized definition, tight-vs-scattered separation, outlier via
min_cos, zero-vector handling."""

from __future__ import annotations

import math

import numpy as np

from tits_spark.operators.coherence import label_coherence


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def _brute(vecs):
    q = np.array(
        [[math.floor(float(np.float32(x)) * 1e4) for x in v] for v in vecs],
        dtype=np.int64,
    )
    s = q.sum(axis=0)
    cqs = []
    n_zero = 0
    for row in q:
        q2 = int((row * row).sum())
        s2 = int((s * s).sum())
        if q2 > 0 and s2 > 0:
            dot = int((row * s).sum())
            cqs.append(math.floor(dot / math.sqrt(q2 * s2) * 1e9))
        else:
            n_zero += 1
    mean = None if not cqs else math.floor(sum(cqs) / len(cqs))
    mn = None if not cqs else min(cqs)
    return len(vecs), n_zero, mean, mn


def test_brute_force_parity(spark):
    rng = np.random.default_rng(67)
    rows, per_label = [], {}
    vid = 0
    for lab in range(3):
        vecs = [rng.normal(size=8).astype(np.float32) for _ in range(15)]
        per_label[lab] = vecs
        for v in vecs:
            rows.append((vid, lab, [float(x) for x in v]))
            vid += 1
    got = {r["label"]: r for r in label_coherence(_mk(spark, rows)).collect()}
    for lab, vecs in per_label.items():
        n, nz, mean, mn = _brute(vecs)
        assert (got[lab]["n_vecs"], got[lab]["n_zero"]) == (n, nz)
        assert got[lab]["mean_cos_u9"] == mean
        assert got[lab]["min_cos_u9"] == mn


def test_tight_cluster_beats_scattered(spark):
    rng = np.random.default_rng(71)
    base = rng.normal(size=16).astype(np.float32)
    rows, vid = [], 0
    for _ in range(20):  # label 0: base + tiny noise
        v = base + rng.normal(scale=0.01, size=16).astype(np.float32)
        rows.append((vid, 0, [float(x) for x in v])); vid += 1
    for _ in range(20):  # label 1: isotropic scatter
        v = rng.normal(size=16).astype(np.float32)
        rows.append((vid, 1, [float(x) for x in v])); vid += 1
    out = {r["label"]: r for r in label_coherence(_mk(spark, rows)).collect()}
    assert out[0]["mean_cos_u9"] > 990_000_000      # ~1.0
    assert out[1]["mean_cos_u9"] < 700_000_000


def test_min_cos_flags_planted_outlier(spark):
    rng = np.random.default_rng(73)
    base = rng.normal(size=16).astype(np.float32)
    rows = [
        (i, 0, [float(x) for x in
                (base + rng.normal(scale=0.01, size=16).astype(np.float32))])
        for i in range(19)
    ]
    rows.append((99, 0, [float(-x) for x in base]))  # antipodal outlier
    got = label_coherence(_mk(spark, rows)).collect()[0]
    assert got["min_cos_u9"] < -800_000_000
    assert got["mean_cos_u9"] > 700_000_000


def test_zero_vectors_counted_out(spark):
    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.1, 0.0]),
        (2, 0, [0.0, 0.0, 0.0]),  # quantizes to the zero vector
    ]
    got = label_coherence(_mk(spark, rows)).collect()[0]
    assert got["n_vecs"] == 3 and got["n_zero"] == 1
    assert got["mean_cos_u9"] > 900_000_000
