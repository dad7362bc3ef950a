"""BH-FDR step-up: brute-force parity, planted strong-signal subset,
no-rejection and all-rejection poles."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.cross_section import bh_fdr


def _stats(spark, pairs):
    df = spark.createDataFrame(
        [(k, float(s)) for k, s in pairs], "key string, stat double"
    )
    return df.select("key", "stat", F.col("stat").alias("p"))


def _brute(pairs, alpha=0.05):
    rows = sorted(pairs, key=lambda kp: (kp[1], kp[0]))
    m = len(rows)
    k_star = 0
    for i, (_, p) in enumerate(rows, start=1):
        if p <= alpha * i / m:
            k_star = i
    return {k: (i, i <= k_star) for i, (k, _) in enumerate(rows, 1)}, k_star


def test_bh_brute_force_parity(spark):
    pairs = [
        ("a", 0.0001), ("b", 0.0004), ("c", 0.0019), ("d", 0.0095),
        ("e", 0.0201), ("f", 0.0278), ("g", 0.0298), ("h", 0.0344),
        ("i", 0.0459), ("j", 0.3240), ("k", 0.4262), ("l", 0.5719),
        ("m", 0.6528), ("n", 0.7590), ("o", 1.0),
    ]  # Benjamini & Hochberg 1995 §4's worked example (m = 15)
    want, k_star = _brute(pairs)
    got = {r["key"]: r for r in bh_fdr(_stats(spark, pairs)).collect()}
    assert len(got) == 15
    for k, (rnk, rej) in want.items():
        assert (got[k]["rnk"], got[k]["reject"]) == (rnk, rej), k
        assert got[k]["k_star"] == k_star
    # the 1995 paper rejects the four smallest at q* = 0.05
    assert k_star == 4


def test_bh_poles(spark):
    none = [(f"k{i}", 0.5 + 0.01 * i) for i in range(10)]
    got = bh_fdr(_stats(spark, none)).collect()
    assert all(not r["reject"] and r["k_star"] == 0 for r in got)
    alln = [(f"k{i}", 0.0001 * (i + 1)) for i in range(10)]
    got = bh_fdr(_stats(spark, alln)).collect()
    assert all(r["reject"] and r["k_star"] == 10 for r in got)


def test_bh_tie_break_deterministic(spark):
    pairs = [("b", 0.02), ("a", 0.02), ("c", 0.9)]
    got = {r["key"]: r for r in bh_fdr(_stats(spark, pairs)).collect()}
    assert got["a"]["rnk"] == 1 and got["b"]["rnk"] == 2
