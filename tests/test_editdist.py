"""levenshtein_pairs: hand cases (blocking, band, ASCII gate)."""

from __future__ import annotations

from tits_spark.operators.editdist import levenshtein_pairs

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the river runs past the old mill toward the quiet harbor town"
)


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r.id_a, r.id_b): r for r in levenshtein_pairs(df, **kw).collect()}


def test_near_dup_found_with_distance(spark):
    edited = BASE.replace("quick", "swift").replace("quiet", "sleepy")
    far = "completely different content with no overlap at all " * 3
    out = _pairs(spark, [(1, BASE), (2, edited), (3, far)])
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # 'quick'->'swift' = 4 edits (q->s, u->w, c->f, k->t), and
    # 'quiet'->'sleepy' = 5; blocking keeps the pair via the long
    # untouched middle run
    assert r.lev == 9
    assert r.len_a == len(BASE) and r.len_b == len(edited)


def test_length_band_prefilter(spark):
    # same prefix but 60 appended chars -> |len diff| > max_dist, pair
    # dropped before any DP
    out = _pairs(spark, [(1, BASE), (2, BASE + "x" * 60)], max_dist=40)
    assert out == {}


def test_ascii_gate(spark):
    # the non-ASCII twin is excluded wholesale (Spark codepoint vs
    # DuckDB byte distance would disagree), the ASCII twin still pairs
    out = _pairs(spark, [(1, BASE), (2, BASE + " end"), (3, BASE + " café")])
    assert set(out) == {(1, 2)}


def test_identical_docs_distance_zero(spark):
    out = _pairs(spark, [(1, BASE), (2, BASE)])
    assert out[(1, 2)].lev == 0
