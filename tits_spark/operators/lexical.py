"""Sparse lexical similarity: tf-idf / BM25 vectors, inverted-index top-k.

The scale path for "find me similar documents" when embeddings are too
expensive or a lexical signal is wanted (near-dup triage, template
detection, retrieval baselines): cosine over tf-idf weights, computed
as a TERM-keyed equi-join (the relational form of an inverted index),
never a doc x doc cross product. Ingredients:

 - tokenizer: the canonical curation tokenizer
   (:func:`tits_spark.operators.text._tokens`), so oracles and the
   other token-level operators share one scheme;
 - idf: smoothed ``ln((N+1)/(df+1)) + 1`` (the scikit-learn
   formulation, pinned so the DuckDB oracle can reproduce it exactly);
 - df cap: terms appearing in more than ``max_df_frac`` of the corpus
   are dropped BEFORE the join — at web scale the head terms ("the")
   are both useless for ranking and the skew that kills the shuffle,
   so the cap is simultaneously the quality filter and the skew guard;
 - norms are computed over the kept vocabulary only, identically on
   both sides of the score.

Plan shape: one groupBy per side keyed (doc, term), the df table, a
term-keyed join for the dot products (query side broadcast when small
— the common retrieval case, making the corpus-side scan map-only),
and a per-query window for the top-k. Ranking is on the ROUNDED score
(6 dp) with doc-id tie-break, a total order that is stable across
summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens


def _term_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    return toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_weights(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-(doc, term) tf-idf weights over the df-capped vocabulary,
    with the per-doc L2 norm attached.

    ``n_docs`` skips the corpus count when the caller already knows it
    (e.g. from table metadata). Returns (doc, term, w, norm).
    """
    n = int(n_docs) if n_docs is not None else corpus.count()
    tf = _term_counts(corpus, id_col, text_col)
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df_frac * n)
    )
    w = tf.join(dfreq, "term").withColumn(
        "w", F.col("tf") * (F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)) + 1.0)
    )
    norm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc")))
    return w.select("doc", "term", "w", norm.alias("norm"))


def tfidf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_frac: float = 0.5,
    exclude_self: bool = True,
    broadcast_queries: bool = True,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` corpus documents by tf-idf cosine for each query doc.

    idf/df (and the df cap) come from the CORPUS; query documents are
    weighted against that same vocabulary, so queries need not be a
    subset of the corpus. Pairs sharing no kept term score 0 and are
    simply absent (standard inverted-index semantics). Returns
    (q_doc, rank, c_doc, score) with score rounded to 6 dp and rank a
    1-based dense position by (score desc, c_doc asc).
    """
    n = int(n_docs) if n_docs is not None else corpus.count()
    ctf = _term_counts(corpus, id_col, text_col)
    dfreq = (
        ctf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df_frac * n)
    )
    idf = F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)) + 1.0

    cw = ctf.join(dfreq, "term").withColumn("w", F.col("tf") * idf)
    cw = cw.withColumn(
        "norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc")))
    ).select(
        F.col("doc").alias("c_doc"), "term", F.col("w").alias("cw"),
        F.col("norm").alias("cnorm"),
    )

    qtf = _term_counts(queries, id_col, text_col)
    qw = qtf.join(dfreq, "term").withColumn("w", F.col("tf") * idf)
    qw = qw.withColumn(
        "norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc")))
    ).select(
        F.col("doc").alias("q_doc"), "term", F.col("w").alias("qw"),
        F.col("norm").alias("qnorm"),
    )
    if broadcast_queries:
        qw = F.broadcast(qw)

    pairs = qw.join(cw, "term")
    if exclude_self:
        pairs = pairs.filter(F.col("q_doc") != F.col("c_doc"))
    dots = pairs.groupBy("q_doc", "c_doc").agg(
        F.sum(F.col("qw") * F.col("cw")).alias("dot"),
        F.first("qnorm").alias("qnorm"),
        F.first("cnorm").alias("cnorm"),
    )
    score = F.round(F.col("dot") / (F.col("qnorm") * F.col("cnorm")), 6)
    ranked = dots.withColumn("score", score).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_doc").orderBy(F.desc("score"), F.asc("c_doc"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select("q_doc", "rank", "c_doc", "score")


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    exclude_self: bool = True,
    broadcast_queries: bool = True,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` corpus documents by Okapi BM25 for each query doc.

    The probabilistic-retrieval sibling of :func:`tfidf_topk` — same
    inverted-index plan shape (term-keyed equi-join, never doc x doc,
    df cap as simultaneous quality filter and skew guard), different
    weighting (Robertson & Spärck Jones; the Lucene-style non-negative
    idf so every component is pinned for the oracle):

        idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
        w_d(t)     = idf(t) * tf * (k1 + 1)
                     / (tf + k1 * (1 - b + b * dl_d / avgdl))
        score(q,d) = sum_t qtf_t * w_d(t)

    ``dl_d`` is the FULL token length of document d (counted before the
    df cap, so head-term removal doesn't change length normalization)
    and ``avgdl = total_tokens / N`` — both exact integers divided once
    to double. Scores are ranked ROUNDED (6 dp) with doc-id tie-break,
    a total order stable across summation orders.

    Plan: tf groupBy, per-doc length groupBy, df table, term-keyed
    join with the (small) query side broadcast, one window for the
    top-k; the only scalars on the driver are N and total_tokens (two
    metadata-sized aggregates). Returns (q_doc, rank, c_doc, score).
    """
    n = int(n_docs) if n_docs is not None else corpus.count()
    ctf = _term_counts(corpus, id_col, text_col)
    # full doc length (pre-cap) + corpus-total token count for avgdl
    dl = ctf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    total_tokens = dl.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = float(total_tokens) / n if n else 1.0
    dfreq = (
        ctf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df_frac * n)
    )
    idf = F.log(
        1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    cw = (
        ctf.join(dfreq, "term")
        .join(dl, "doc")
        .withColumn(
            "w",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (1.0 - b + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .select(F.col("doc").alias("c_doc"), "term", "w")
    )
    qtf = _term_counts(queries, id_col, text_col).select(
        F.col("doc").alias("q_doc"), "term", F.col("tf").alias("qtf")
    )
    if broadcast_queries:
        qtf = F.broadcast(qtf)
    pairs = qtf.join(cw, "term")
    if exclude_self:
        pairs = pairs.filter(F.col("q_doc") != F.col("c_doc"))
    scores = pairs.groupBy("q_doc", "c_doc").agg(
        F.round(F.sum(F.col("qtf") * F.col("w")), 6).alias("score")
    )
    ranked = scores.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_doc").orderBy(F.desc("score"), F.asc("c_doc"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select("q_doc", "rank", "c_doc", "score")


def tfidf_cosine_pairs(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df: int = 50,
    ngram_n: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """All near-duplicate pairs by tf-idf cosine over df-capped word
    n-gram terms — the WEIGHTED sibling of dedup.ngram_jaccard_pairs:
    where Jaccard treats every shingle equally, tf-idf cosine weights
    shared sequences by their rarity, so boilerplate n-grams are
    dropped (df cap) or down-weighted (idf) by construction. Word
    n-grams (default 3), not unigrams, are the term unit: duplicated
    TEXT shares rare sequences even when its vocabulary is common —
    single words on a hot vocabulary produce no usable signal.

    The ABSOLUTE df cap (``max_df``) is simultaneously the quality
    filter and the scale control: a term shared by d documents feeds
    d*(d-1)/2 candidate pairs into the term-keyed equi-join, so the
    join fan-out is bounded by max_df^2/2 per term — never doc x doc.
    (Same argument as the n-gram Jaccard freq cap; at web scale this is
    the difference between a linear pass and a quadratic blowup.)

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to
    6 dp, pairs below ``threshold`` dropped.
    """
    from tits_spark.operators.text import word_ngrams_col

    # n_docs=None no longer triggers an eager driver-side count() at
    # plan-build time (the round-4 review nit): the corpus size joins
    # in lazily as a broadcast 1-row aggregate — same value, same idf
    # doubles, but the count job runs WITH the query, cluster-side
    n = int(n_docs) if n_docs is not None else None
    if int(ngram_n) > 1:
        tf = (
            corpus.select(
                F.col(id_col).alias("doc"),
                F.explode(word_ngrams_col(F.col(text_col), int(ngram_n))).alias(
                    "term"
                ),
            )
            .groupBy("doc", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        tf = _term_counts(corpus, id_col, text_col)
    # r06: document frequency rides a count WINDOW over the term
    # partitioning instead of a groupBy + join-back — the join's two
    # references re-ran the tokenize+explode subtree twice (guide
    # §2.4), and the window shuffles tf by term once where the old
    # plan shuffled it twice (aggregate + join). Same df values, same
    # surviving rows.
    w = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).filter(F.col("df") <= int(max_df))
    if n is None:
        w = w.crossJoin(
            F.broadcast(corpus.agg(F.count(F.lit(1)).alias("_n")))
        )
        n_expr = F.col("_n")
    else:
        n_expr = F.lit(n)
    w = w.withColumn(
        "w", F.col("tf") * (F.log((n_expr + 1.0) / (F.col("df") + 1.0)) + 1.0)
    ).drop("_n")
    w = w.withColumn(
        "norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc")))
    ).select("doc", "term", "w", "norm")
    # both join sides derive from this frame: persist it (dtw/rfm
    # precedent) or the tokenize+explode+cap subtree runs once per
    # reference — measured ~3x the wall at bench scale. At cluster
    # scale this is the materialized weights table a production
    # pipeline would write between stages.
    w = w.persist()
    a = w.select(
        F.col("doc").alias("id_a"), "term",
        F.col("w").alias("wa"), F.col("norm").alias("na"),
    )
    b = w.select(
        F.col("doc").alias("id_b"), "term",
        F.col("w").alias("wb"), F.col("norm").alias("nb"),
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    cosine = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (
        dots.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= float(threshold))
        .select("id_a", "id_b", "cosine")
    )
