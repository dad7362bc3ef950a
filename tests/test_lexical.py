"""tf-idf inverted-index top-k vs a naive numpy reference."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.lexical import tfidf_topk, tfidf_weights

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "the cluster shuffles spark data quickly"),
    (2, "ducks swim across the pond"),
    (3, "the pond holds many swimming ducks"),
    (4, "spark reads parquet data from the lake"),
    (5, "completely unrelated zebra xylophone"),
]


def _tok(s):
    return [t for t in re.sub(r"[^a-zA-Z0-9]+", " ", s).lower().split(" ") if t]


def _naive_topk(corpus, queries, k=3, max_df_frac=1.0):
    n = len(corpus)
    tfs = {i: Counter(_tok(t)) for i, t in corpus}
    df = Counter(t for c in tfs.values() for t in c)
    keep = {t for t, d in df.items() if d <= max_df_frac * n}
    idf = {t: math.log((n + 1) / (df[t] + 1)) + 1 for t in keep}

    def vec(c):
        return {t: c[t] * idf[t] for t in c if t in keep}

    cvecs = {i: vec(c) for i, c in tfs.items()}
    out = []
    for qi, qt in queries:
        qv = vec(Counter(_tok(qt)))
        qn = math.sqrt(sum(w * w for w in qv.values()))
        scored = []
        for ci, cv in cvecs.items():
            if ci == qi:
                continue
            dot = sum(qv.get(t, 0.0) * w for t, w in cv.items())
            if dot == 0.0:
                continue
            cn = math.sqrt(sum(w * w for w in cv.values()))
            scored.append((round(dot / (qn * cn), 6), ci))
        scored.sort(key=lambda s: (-s[0], s[1]))
        out += [(qi, r + 1, ci, sc) for r, (sc, ci) in enumerate(scored[:k])]
    return pd.DataFrame(out, columns=["q_doc", "rank", "c_doc", "score"])


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_tfidf_topk_matches_naive(spark):
    corpus = _df(spark, DOCS)
    queries = corpus.filter(F.col("doc_id").isin(0, 2))
    got = (
        tfidf_topk(corpus, queries, k=3, max_df_frac=1.0)
        .toPandas()
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    want = _naive_topk(DOCS, [(0, DOCS[0][1]), (2, DOCS[2][1])], k=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tfidf_df_cap_drops_head_terms(spark):
    corpus = _df(spark, DOCS)
    # "the" appears in 5/6 docs; cap at 0.5 must remove it
    w = tfidf_weights(corpus, max_df_frac=0.5).toPandas()
    assert "the" not in set(w["term"])
    assert "zebra" in set(w["term"])


def test_tfidf_query_outside_corpus(spark):
    corpus = _df(spark, DOCS)
    queries = _df(spark, [(99, "zebra xylophone music")])
    got = tfidf_topk(corpus, queries, k=2, max_df_frac=1.0).toPandas()
    # doc 5 is the only one sharing kept terms
    assert list(got["c_doc"]) == [5]
    assert got.iloc[0]["score"] > 0


def test_tfidf_broadcasts_query_side(spark):
    corpus = _df(spark, DOCS)
    queries = corpus.filter(F.col("doc_id") == 0)
    plan = (
        tfidf_topk(corpus, queries)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- BM25


def _naive_bm25(corpus, queries, k=3, k1=1.2, b=0.75, max_df_frac=1.0):
    from tits_spark.operators.lexical import bm25_topk  # noqa: F401 (parity)

    n = len(corpus)
    tfs = {i: Counter(_tok(t)) for i, t in corpus}
    df = Counter(t for c in tfs.values() for t in c)
    keep = {t for t, d in df.items() if d <= max_df_frac * n}
    dl = {i: sum(c.values()) for i, c in tfs.items()}
    avgdl = sum(dl.values()) / n
    idf = {t: math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in keep}
    out = []
    for qi, qt in queries:
        qc = Counter(_tok(qt))
        scored = []
        for ci, cv in tfs.items():
            if ci == qi:
                continue
            s = 0.0
            for t, qtf in qc.items():
                if t not in keep or t not in cv:
                    continue
                tf = cv[t]
                s += qtf * idf[t] * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dl[ci] / avgdl)
                )
            if s > 0.0:
                scored.append((round(s, 6), ci))
        scored.sort(key=lambda s: (-s[0], s[1]))
        out += [(qi, r + 1, ci, sc) for r, (sc, ci) in enumerate(scored[:k])]
    return pd.DataFrame(out, columns=["q_doc", "rank", "c_doc", "score"])


def test_bm25_topk_matches_naive(spark):
    from tits_spark.operators.lexical import bm25_topk

    corpus = _df(spark, DOCS)
    queries = corpus.filter(F.col("doc_id").isin(0, 2))
    got = (
        bm25_topk(corpus, queries, k=3, max_df_frac=1.0)
        .toPandas()
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    want = _naive_bm25(DOCS, [(0, DOCS[0][1]), (2, DOCS[2][1])], k=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bm25_length_normalization_prefers_shorter(spark):
    # same tf for the query term, shorter doc must score higher
    rows = [
        (0, "needle"),
        (1, "needle haystack haystack haystack haystack haystack"),
        (2, "needle haystack"),
    ]
    corpus = _df(spark, rows)
    queries = _df(spark, [(99, "needle")])
    got = bm25_import_topk(corpus, queries)
    assert list(got.sort_values("rank")["c_doc"]) == [0, 2, 1]


def bm25_import_topk(corpus, queries):
    from tits_spark.operators.lexical import bm25_topk

    return bm25_topk(corpus, queries, k=3, max_df_frac=1.0).toPandas()


def test_bm25_broadcasts_query_side(spark):
    from tits_spark.operators.lexical import bm25_topk

    corpus = _df(spark, DOCS)
    queries = corpus.filter(F.col("doc_id") == 0)
    plan = (
        bm25_topk(corpus, queries)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_cosine_pairs_finds_near_dups_and_caps_df(spark):
    from tits_spark.operators.lexical import tfidf_cosine_pairs

    base = "quantum flux capacitor resonance harmonics drift alignment"
    docs = spark.createDataFrame(
        [
            (0, base + " alpha"),
            (1, base + " beta"),              # near-dup of 0
            (2, "completely different words about cooking pasta sauce"),
            # boilerplate term shared by everyone must not pair 2 with 0/1
        ]
        + [(10 + i, f"boilerplate filler number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(docs, threshold=0.3, max_df=10).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7
    assert all(not (a == 2 or b == 2) for a, b in pairs)
    # canonical ordering
    assert all(a < b for a, b in pairs)


def test_tfidf_cosine_pairs_df_cap_drops_hot_terms(spark):
    from tits_spark.operators.lexical import tfidf_cosine_pairs

    # every doc shares "common"; with max_df=2 the hot term is dropped,
    # so docs overlapping ONLY on it produce no pair at all
    docs = spark.createDataFrame(
        [(i, f"common unique{i} token{i}") for i in range(10)],
        "doc_id long, text string",
    )
    assert tfidf_cosine_pairs(docs, threshold=0.0, max_df=2).collect() == []
