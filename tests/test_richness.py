"""Lexical richness (Yule's K family) + ARI/Coleman-Liau: brute-force
parity against a Counter-based reference, planted repetitive-vs-varied
separation, degenerate edges (empty, single-token, all-hapax)."""

from __future__ import annotations

import math
import re
from collections import Counter

from tits_spark.operators.readability import ari_coleman_liau
from tits_spark.operators.richness import lexical_richness


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_counts(text):
    toks = [t for t in re.sub(r"[^a-zA-Z0-9]+", " ", text).lower().split(" ") if t]
    tf = Counter(toks)
    n = len(toks)
    v = len(tf)
    v1 = sum(1 for m in tf.values() if m == 1)
    sm2 = sum(m * m for m in tf.values())
    return n, v, v1, sm2


def test_richness_brute_force_parity(spark):
    texts = [
        "the cat sat on the mat and the cat ran",
        "alpha beta gamma delta epsilon",
        "buy buy buy Buy BUY now now NOW",
        "a b c a b a",
        "One fish, two fish; red fish, blue fish!",
    ]
    got = {r["doc_id"]: r for r in lexical_richness(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        n, v, v1, sm2 = _brute_counts(t)
        r = got[i]
        assert (r["n_tokens"], r["v_types"], r["v1_hapax"], r["sum_m2"]) == (
            n, v, v1, sm2,
        ), t
        assert r["yules_k"] == round(1e4 * (sm2 - n) / (n * n), 6) + 0.0
        if n >= 2:
            assert r["herdan_c"] == round(math.log(v) / math.log(n), 6) + 0.0
        assert r["guiraud_r"] == round(v / math.sqrt(n), 6) + 0.0
        if n >= 2 and v1 < v:
            assert r["honore_h"] == round(
                100.0 * math.log(n) / (1.0 - v1 / v), 6
            ) + 0.0
        else:
            assert r["honore_h"] is None


def test_richness_planted_separation(spark):
    spam = "click here to win " * 50
    prose = (
        "morning fog lifted over quiet harbors while distant gulls "
        "wheeled above rusting trawlers and children counted waves"
    )
    got = {
        r["doc_id"]: r
        for r in lexical_richness(_docs(spark, [spam, prose])).collect()
    }
    assert got[0]["yules_k"] > 100 * max(got[1]["yules_k"], 1e-9)
    # all-distinct text: sum m^2 == N exactly -> K == 0, hapax == V
    assert got[1]["sum_m2"] == got[1]["n_tokens"]
    assert got[1]["yules_k"] == 0.0
    assert got[1]["honore_h"] is None  # all-hapax pole


def test_richness_degenerate_edges(spark):
    out = lexical_richness(
        _docs(spark, ["", "...!!!", "word", "word word"])
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 0 not in by_id and 1 not in by_id  # token-free docs drop
    one = by_id[2]
    assert (one["n_tokens"], one["v_types"], one["v1_hapax"]) == (1, 1, 1)
    assert one["herdan_c"] is None  # ln(1)/ln(1) pole
    two = by_id[3]
    assert (two["n_tokens"], two["v_types"], two["v1_hapax"]) == (2, 1, 0)
    assert two["sum_m2"] == 4
    assert two["honore_h"] == round(100.0 * math.log(2) / (1.0 - 0.0), 6)


def test_ari_cl_exact_lattice(spark):
    """The centigrade lattice equals floor(100*published formula) on
    cases that include the 4dp/6dp rounding-boundary traps."""
    cases = [
        # (text engineered so chars/words/sentences are known)
        "aa bb cc dd.",          # c=8, w=4, s=1
        ("x" * 259 + " y") ,      # no sentence mark -> s=1 floor
    ]
    out = {r["doc_id"]: r for r in ari_coleman_liau(_docs(spark, cases)).collect()}
    for i, t in enumerate(cases):
        c = len(re.sub(r"[^a-zA-Z0-9]", "", t))
        w = len([x for x in re.sub(r"[^a-zA-Z0-9]+", " ", t).lower().split() if x])
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        r = out[i]
        assert (r["n_chars_an"], r["n_words"], r["n_sentences"]) == (c, w, s)
        assert r["ari_c"] == (471 * c * s + 50 * w * w - 2143 * w * s) // (w * s)
        assert r["cl_c"] == (588 * c - 2960 * s - 1580 * w) // w
        assert r["ari"] == r["ari_c"] / 100.0
        assert r["cl_index"] == r["cl_c"] / 100.0


def test_ari_cl_negative_numerator_floor(spark):
    """A terse fragment drives both grades negative: the signed floor
    must round toward -inf on both engines (Python // is the spec)."""
    t = "go. no! up?"
    r = ari_coleman_liau(_docs(spark, [t])).collect()[0]
    c, w, s = 6, 3, 3
    assert (r["n_chars_an"], r["n_words"], r["n_sentences"]) == (c, w, s)
    num_a = 471 * c * s + 50 * w * w - 2143 * w * s
    assert num_a < 0
    assert r["ari_c"] == num_a // (w * s)
    num_c = 588 * c - 2960 * s - 1580 * w
    assert num_c < 0
    assert r["cl_c"] == num_c // w
