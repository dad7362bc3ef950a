"""Exact-substring dedup: hand-built span cases + invariants on the
real documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.substring_dedup import duplicated_spans, exact_substring_dedup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_duplicate_removed_once(spark):
    # identical 6-token passage in two docs; L=4 -> doc 1 keeps it
    # (canonical), doc 2 loses exactly the passage
    passage = "alpha beta gamma delta epsilon zeta"
    df = _mk(spark, [
        (1, f"start {passage} end one"),
        (2, f"other words here {passage} trailing"),
    ])
    out = {r.doc_id: r for r in exact_substring_dedup(df, length=4).collect()}
    assert out[1].n_spans == 0 and out[1].n_tokens_removed == 0
    assert passage in out[1].text_dedup
    assert out[2].n_spans == 1 and out[2].n_tokens_removed == 6
    assert passage not in out[2].text_dedup
    assert out[2].text_dedup == "other words here trailing"


def test_overlapping_windows_merge_to_one_island(spark):
    # a duplicated run of M tokens yields M-L+1 windows that must merge
    # into ONE island of exactly M tokens
    run = " ".join(f"w{i}" for i in range(10))
    df = _mk(spark, [(1, f"{run} unique1"), (2, f"unique2 {run}")])
    spans = duplicated_spans(df, length=4).collect()
    assert len(spans) == 1
    s = spans[0]
    assert s.id == 2 and s.span_end - s.span_start + 1 == 10


def test_within_doc_repetition(spark):
    # the same doc repeating its own passage: second occurrence removed
    p = "p q r s"
    df = _mk(spark, [(1, f"{p} x y z {p} tail")])
    out = exact_substring_dedup(df, length=4).collect()[0]
    assert out.n_spans == 1 and out.n_tokens_removed == 4
    assert out.text_dedup == "p q r s x y z tail"


def test_short_docs_untouched(spark):
    df = _mk(spark, [(1, "tiny doc"), (2, "tiny doc")])
    out = {r.doc_id: r for r in exact_substring_dedup(df, length=4).collect()}
    # both shorter than L: no windows, nothing removed
    assert out[1].n_tokens_removed == 0 and out[2].n_tokens_removed == 0
    assert out[1].text_dedup == "tiny doc"


def test_invariants_on_real_docs(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = exact_substring_dedup(docs, length=8)
    assert out.count() == docs.count()
    bad = out.filter(
        (F.col("n_tokens_removed") > F.col("n_tokens"))
        | (F.col("n_tokens_removed") < 0)
        | ((F.col("n_spans") > 0) & (F.col("n_tokens_removed") < 8))
    )
    assert bad.count() == 0
    # removing spans then re-running must be a fixed point on the
    # surviving token stream for the docs that had no spans
    clean = out.filter(F.col("n_spans") == 0).count()
    assert clean > 0


def test_no_cartesian_in_plan(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plan = exact_substring_dedup(docs, length=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
