"""Round-3 training-pipeline operators: benchmark decontamination,
Gopher-style repetition filters, exact-mixture domain reweighting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.decontam import (
    contamination_report,
    decontaminate,
    word_ngrams,
)
from tits_spark.operators.sampling import domain_mix_exact
from tits_spark.operators.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontam:
    def test_ngram_generation(self, spark):
        df = _docs(spark, [(1, "The quick, brown FOX jumps over the lazy dog")])
        grams = {r["ngram"] for r in word_ngrams(df, 5).collect()}
        assert "the quick brown fox jumps" in grams
        assert "jumps over the lazy dog" in grams
        assert len(grams) == 5  # 9 tokens -> 5 distinct 5-grams

    def test_short_doc_yields_no_grams(self, spark):
        df = _docs(spark, [(1, "only four words here"), (2, ""), (3, "  .,  ")])
        assert word_ngrams(df, 5).count() == 0

    def test_overlap_flags_exact_and_partial(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
        train = _docs(
            spark,
            [
                # shares the full benchmark text -> both 5-grams hit
                (1, "intro words alpha beta gamma delta epsilon zeta outro"),
                # shares no 5-gram (only a 4-word overlap)
                (2, "alpha beta gamma delta UNRELATED tail words here"),
                (3, "completely different content with no overlap at all"),
            ],
        )
        rep = {
            r["doc_id"]: (r["n_hits"], r["contaminated"])
            for r in contamination_report(train, bench, n=5).collect()
        }
        assert rep[1] == (2, True)
        assert rep[2] == (0, False)
        assert rep[3] == (0, False)

    def test_decontaminate_removes_flagged(self, spark):
        bench = _docs(spark, [(100, "one two three four five")])
        train = _docs(
            spark,
            [(1, "zz one two three four five yy"), (2, "safe doc with enough words")],
        )
        kept = [r["doc_id"] for r in decontaminate(train, bench, n=5).collect()]
        assert kept == [2]

    def test_report_covers_every_doc(self, spark):
        bench = _docs(spark, [(9, "a b c d e")])
        train = _docs(spark, [(1, ""), (2, "x"), (3, "a b c d e")])
        rep = contamination_report(train, bench, n=5)
        assert rep.count() == 3

    def test_benchmark_side_is_broadcast(self, spark):
        bench = _docs(spark, [(9, "a b c d e f g")])
        train = _docs(spark, [(1, "a b c d e f g h")])
        plan = contamination_report(train, bench, n=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestRepetition:
    def test_planted_repeated_phrase(self, spark):
        # "spam ham" repeated 10x: top 2-gram = ("spam ham", count 10,
        # mass 7) over 70 total token chars -> frac 1.0; every 5-gram
        # appears many times -> dup5 frac > 0
        df = _docs(spark, [(1, " ".join(["spam ham"] * 10))])
        row = repetition_features(df).collect()[0]
        assert row["top2gram_char_frac"] == pytest.approx(1.0)
        assert row["dup5gram_char_frac"] > 0.5
        assert row["dup_line_frac"] == 0.0

    def test_no_repetition(self, spark):
        df = _docs(spark, [(1, "each word here is totally unique today")])
        row = repetition_features(df).collect()[0]
        # 7 unique tokens: top 2-gram occurs once -> frac = its mass/total
        assert 0.0 < row["top2gram_char_frac"] < 0.5
        assert row["dup5gram_char_frac"] == 0.0
        assert row["dup_line_frac"] == 0.0

    def test_duplicate_lines(self, spark):
        txt = "header\nbody line\nbody line\nbody line\n\nfooter"
        df = _docs(spark, [(1, txt)])
        row = repetition_features(df).collect()[0]
        # 5 non-empty lines, 3 distinct -> 2/5 duplicates
        assert row["dup_line_frac"] == pytest.approx(0.4)

    def test_empty_and_short_docs_get_zeros(self, spark):
        df = _docs(spark, [(1, ""), (2, "word"), (3, "   ")])
        rows = {r["doc_id"]: r for r in repetition_features(df).collect()}
        assert len(rows) == 3
        for r in rows.values():
            assert r["top2gram_char_frac"] == 0.0
            assert r["dup5gram_char_frac"] == 0.0

    def test_partition_invariant(self, spark):
        rows = [(i, f"w{i % 7} common phrase w{i % 3} common phrase end") for i in range(40)]
        df = _docs(spark, rows)
        a = sorted(map(tuple, repetition_features(df).collect()))
        b = sorted(map(tuple, repetition_features(df.repartition(17)).collect()))
        assert a == b


class TestDomainMix:
    def _corpus(self, spark):
        rows = [(i, "a" if i < 100 else ("b" if i < 160 else "c")) for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_exact_mixture_max_retention(self, spark):
        # counts a=100 b=60 c=40; weights 1:1:1 -> T = min(c_d/w_d)/...
        # binding domain c: T = 120, k_d = 40 each
        out = domain_mix_exact(self._corpus(spark), {"a": 1.0, "b": 1.0, "c": 1.0})
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == {"a": 40, "b": 40, "c": 40}

    def test_skewed_weights(self, spark):
        # weights a:6 b:3 c:1 -> binding is b (60/0.3=200): quotas
        # floor(0.6*200)=120 capped by... a has only 100 -> binding is
        # a (100/0.6=166.67): k = floor(.6*166.67)=100, 50, 16
        out = domain_mix_exact(self._corpus(spark), {"a": 6.0, "b": 3.0, "c": 1.0})
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == {"a": 100, "b": 50, "c": 16}

    def test_unlisted_domain_dropped(self, spark):
        out = domain_mix_exact(self._corpus(spark), {"a": 1.0})
        assert out.filter(F.col("source") != "a").count() == 0
        assert out.count() == 100  # full retention of the only domain

    def test_partition_invariant_selection(self, spark):
        corpus = self._corpus(spark)
        w = {"a": 2.0, "b": 1.0, "c": 1.0}
        ids_a = sorted(r["doc_id"] for r in domain_mix_exact(corpus, w).collect())
        ids_b = sorted(
            r["doc_id"] for r in domain_mix_exact(corpus.repartition(23), w).collect()
        )
        assert ids_a == ids_b

    def test_quota_join_is_broadcast(self, spark):
        plan = (
            domain_mix_exact(self._corpus(spark), {"a": 1.0, "b": 1.0})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
