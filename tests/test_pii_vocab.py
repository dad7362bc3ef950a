"""pii_scrub / vocab_topk / unigram_logprob: hand cases + naive checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.pii import drop_pii_dense, pii_scrub
from tits_spark.operators.vocab import token_counts, unigram_logprob, vocab_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "write to alice.smith+x@corp.example.org or bob@ex.io today"),
        (2, "server at 10.0.255.7 and 999.1.1.1 is not an ip"),
        (3, "ssn 123-45-6789 card 4111 1111 1111 1111 call +1-555-123-4567"),
        (4, "clean text with no pii at all, just words 42 and 7"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(spark, docs):
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].n_email == 2 and out[1].n_pii == 2
    assert "<EMAIL>" in out[1].text_clean and "@" not in out[1].text_clean
    # 999.1.1.1 must NOT match (octet > 255)
    assert out[2].n_ipv4 == 1
    assert "999.1.1.1" in out[2].text_clean and "10.0.255.7" not in out[2].text_clean
    # SSN counted as SSN, not double-counted by DIGITS; card + phone hit DIGITS
    assert out[3].n_ssn == 1
    assert out[3].n_digits == 2
    assert out[3].n_pii == 3
    assert "<SSN>" in out[3].text_clean and "<DIGITS>" in out[3].text_clean
    assert out[4].n_pii == 0 and out[4].text_clean == out[4].text
    assert out[5].n_pii == 0


def test_pii_short_numbers_survive(spark, docs):
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    # short numbers are not PII
    assert "42" in out[4].text_clean and "7" in out[4].text_clean


def test_pii_null_text_counted_and_kept(spark):
    rows = [(1, None), (2, "mail me a@b.io")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    # NULL text: zero counts (not NULL), NULL redacted text
    assert out[1].n_pii == 0 and out[1].text_clean is None
    assert out[2].n_email == 1
    # and the density gate keeps the NULL-text doc instead of silently
    # dropping it from both sides of the threshold
    kept = {r.doc_id for r in drop_pii_dense(df, max_pii_per_kchar=0.0).collect()}
    assert kept == {1}


def test_drop_pii_dense(spark, docs):
    kept = drop_pii_dense(docs, max_pii_per_kchar=20.0)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # doc 3 has 3 hits in ~55 chars -> ~55/kchar, dropped; doc 1 has
    # 2 hits in ~57 chars -> ~35/kchar, dropped too at 20.0
    assert 3 not in ids and 4 in ids and 5 in ids


def test_pii_map_only_plan(spark, docs):
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_vocab_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c"), (2, "d c")], "doc_id long, text string"
    )
    top = vocab_topk(df, k=3).collect()
    # counts: a=2 b=2 c=2 d=1; ties by token asc
    assert [(r.token, r.cnt, r.rank) for r in top] == [
        ("a", 2, 1), ("b", 2, 2), ("c", 2, 3),
    ]


def test_vocab_topk_plan_no_global_sort(spark, docs):
    plan = vocab_topk(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_logprob_naive(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    # corpus counts: a=2 b=2 c=1, total=5
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    lp = math.log
    assert out[1].n_tokens == 3
    assert out[1].logprob == pytest.approx((2 * lp(2 / 5) + lp(2 / 5)) / 3)
    assert out[2].logprob == pytest.approx((lp(2 / 5) + lp(1 / 5)) / 2)
    assert out[3].n_tokens == 0 and out[3].logprob is None


def test_unigram_logprob_on_real_docs(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = unigram_logprob(docs)
    assert out.count() == docs.count()
    stats = out.agg(F.max("logprob").alias("mx"), F.min("logprob").alias("mn")).first()
    # log-probs are negative and finite on non-degenerate corpora
    assert stats.mx < 0.0 and math.isfinite(stats.mn)


def test_bigram_logprob_basic(spark):
    from tits_spark.operators.vocab import bigram_logprob

    docs = spark.createDataFrame(
        [
            (0, "a b a b"),       # bigrams: "a b" x2, "b a" x1
            (1, "a b"),           # one bigram
            (2, "solo"),          # no bigram
            (3, ""),              # empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 1
    assert out[2].n_bigrams == 0 and out[2].logprob is None
    assert out[3].n_bigrams == 0
    # corpus: "a b" cnt=3, "b a" cnt=1; prefixes: a*=3, b*=1
    # doc1: ln(3/3) = 0
    assert out[1].logprob == 0.0
    # doc0: (2*ln(3/3) + 1*ln(1/1)) / 3 = 0 — every bigram is modal here
    assert out[0].logprob == 0.0


def test_bigram_logprob_penalizes_minority_continuations(spark):
    # corpus: "the cat" dominates the continuations of "the";
    # doc 1 always continues "the" with the minority "dog" -> its
    # conditional likelihood must be strictly lower than doc 0's
    docs = spark.createDataFrame(
        [(i, "the cat") for i in range(9)] + [(9, "the dog")],
        "doc_id long, text string",
    )
    from tits_spark.operators.vocab import bigram_logprob

    out = {r.doc_id: r.logprob for r in bigram_logprob(docs).collect()}
    import math

    assert out[0] == pytest.approx(math.log(9 / 10), abs=1e-9)
    assert out[9] == pytest.approx(math.log(1 / 10), abs=1e-9)
    assert out[0] > out[9]
