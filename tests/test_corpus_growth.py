"""Heaps growth, Zipf slope, n-gram novelty, PMI pairs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.corpus_growth import (
    heaps_growth,
    novelty_ngrams,
    pmi_pairs,
    zipf_slope,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_heaps_growth_exact_counts(spark):
    # 10 docs, one per bucket; doc i introduces exactly one new type
    texts = [" ".join(f"w{j}" for j in range(i + 1)) for i in range(10)]
    out = {r["bucket"]: r for r in heaps_growth(_docs(spark, texts)).collect()}
    assert len(out) == 10
    for b in range(10):
        assert out[b]["n_docs"] == 1
        assert out[b]["n_tokens"] == b + 1
        assert out[b]["n_new_types"] == 1
        assert out[b]["cum_types"] == b + 1


def test_heaps_growth_no_new_types_later(spark):
    texts = ["alpha beta"] * 20
    out = {r["bucket"]: r for r in heaps_growth(_docs(spark, texts)).collect()}
    assert out[0]["n_new_types"] == 2
    assert all(out[b]["n_new_types"] == 0 for b in range(1, 10))
    assert out[9]["cum_types"] == 2


def test_zipf_slope_exact_power_law(spark):
    # counts cnt(r) = round(1000 / r) ~ slope -1 over 20 tokens; build a
    # corpus realizing exactly those counts, then verify the closed form
    k = 20
    counts = [round(1000 / r) for r in range(1, k + 1)]
    words = []
    for r, c in enumerate(counts, 1):
        words += [f"t{r:02d}"] * c
    out = zipf_slope(_docs(spark, [" ".join(words)]), k=k).collect()[0]
    x = np.log(np.arange(1, k + 1, dtype=float))
    y = np.log(np.array(counts, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert out["n"] == k
    assert out["slope"] == pytest.approx(slope, abs=1e-4)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-4)
    assert -1.1 < out["slope"] < -0.9


def test_novelty_first_doc_is_fully_novel(spark):
    texts = [
        "a b c d e",            # all 3 of its 3-grams novel
        "a b c d e",            # exact dup: zero novel
        "a b c x y z",          # grams: "a b c" seen; 3 others novel
    ]
    out = {r["doc_id"]: r for r in novelty_ngrams(_docs(spark, texts), n=3).collect()}
    assert out[0]["n_ngrams"] == 3 and out[0]["novelty"] == 1.0
    assert out[1]["n_ngrams"] == 3 and out[1]["n_novel"] == 0
    assert out[2]["n_ngrams"] == 4 and out[2]["n_novel"] == 3
    assert out[2]["novelty"] == 0.75


def test_novelty_short_docs_absent(spark):
    texts = ["one two", "x"]
    assert novelty_ngrams(_docs(spark, texts), n=3).count() == 0


def test_pmi_pairs_golden(spark):
    # 10 docs: {a,b} co-occur in all 10; {a,c} in 5; c alone in 0 more
    texts = ["a b c"] * 5 + ["a b"] * 5
    out = {
        (r["tok_a"], r["tok_b"]): r
        for r in pmi_pairs(
            _docs(spark, texts), vocab_k=10, min_pairs=1
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_ab"] == 10 and ab["n_a"] == 10 and ab["n_b"] == 10
    assert ab["n_docs"] == 10
    assert ab["pmi"] == pytest.approx(round(math.log(10 * 10 / 100), 6))  # 0
    ac = out[("a", "c")]
    assert ac["n_ab"] == 5 and ac["n_b"] == 5
    # pmi = ln(5*10 / (10*5)) = 0 ; bc same
    assert ac["pmi"] == 0.0
    bc = out[("b", "c")]
    assert bc["pmi"] == 0.0


def test_pmi_min_pairs_threshold(spark):
    texts = ["p q"] * 3 + ["p r"] * 12
    out = pmi_pairs(_docs(spark, texts), vocab_k=10, min_pairs=10).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in out} == {("p", "r")}


def test_corpus_growth_plans(spark):
    texts = [f"w{i} w{i+1} common" for i in range(40)]
    df = _docs(spark, texts)
    for frame in (
        heaps_growth(df),
        novelty_ngrams(df, n=2),
        pmi_pairs(df, vocab_k=5, min_pairs=1),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
