"""Corpus-level lexical growth and association statistics.

The four classic "what is this corpus made of" screens a training-data
pipeline runs before mixing a new source in:

 - :func:`heaps_growth` — vocabulary growth curve (Heaps' law): new
   and cumulative distinct word types per corpus decile, in document
   order.  The whole curve is exact integers via the first-occurrence
   trick: a type is "new in bucket b" iff its min(doc_id) falls in b —
   one token explode, one groupBy(token), one 10-row histogram; no
   per-prefix distinct-count blowup.
 - :func:`zipf_slope` — log-log OLS of the rank-frequency curve over
   the top-k tokens (Zipf's law exponent).  Counts and ranks are exact
   integers from vocab_topk; the fit runs on the bounded k-row frame.
 - :func:`novelty_ngrams` — per-document novelty: the fraction of a
   document's distinct word n-grams never seen in any EARLIER document
   (doc-id order) — the incremental-contamination / memorization
   screen.  Same first-occurrence trick, so it needs no per-document
   scan of the past: novel in doc d iff min(doc_id) == d.
 - :func:`pmi_pairs` — pointwise mutual information of token
   co-occurrence within documents, restricted to the global top-V
   vocabulary (the cap is what bounds the pair explosion at corpus
   scale): exact integer document frequencies, PMI as one shared
   closed form.

Scale notes (100 TB): every operator is explode -> hash-agg algebra on
high-cardinality keys (token, ngram, pair), no windows over unbounded
frames, no UDFs.  heaps_growth and novelty avoid the naive "distinct
over every prefix" (quadratic) entirely.  pmi_pairs' self-join is
vocabulary-capped: per-document pair fan-out is <= C(V∩doc, 2) and the
vocab filter is a broadcast semi-join, so the shuffle carries only
top-V tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens, word_ngrams_col


def _exploded_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from tits_spark.operators.skew import ensure_min_parallelism

    return ensure_min_parallelism(df).select(
        id_col, F.explode(_tokens(F.col(text_col))).alias("token")
    )


def heaps_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
) -> DataFrame:
    """Vocabulary growth per corpus decile (document-id order).

    Returns one row per bucket: ``(bucket, n_docs, n_tokens,
    n_new_types, cum_types)`` — all exact BIGINTs.  Buckets split the
    id range ``[0, max_id]`` evenly; with dense ids this is the
    document-count decile.
    """
    mx = df.agg((F.max(id_col) + 1).alias("_hi"))
    bucket = F.floor(F.col(id_col) * n_buckets / F.col("_hi")).alias("bucket")

    docs = (
        df.select(id_col)
        .join(F.broadcast(mx))
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    toks = _exploded_tokens(df, id_col, text_col)
    tok_counts = (
        toks.join(F.broadcast(mx))
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    first = toks.groupBy("token").agg(F.min(id_col).alias("_first"))
    new_types = (
        first.join(F.broadcast(mx))
        .groupBy(
            F.floor(F.col("_first") * n_buckets / F.col("_hi")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_new_types"))
    )
    joined = (
        docs.join(tok_counts, "bucket", "left")
        .join(new_types, "bucket", "left")
        .na.fill(0, ["n_tokens", "n_new_types"])
    )
    # bounded-global-window: cumulative sum over the n_buckets-row
    # histogram (<= n_buckets rows by construction) — NEVER lift this
    # onto an unbounded frame
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "n_new_types",
        F.sum("n_new_types").over(w).alias("cum_types"),
    )


def zipf_slope(
    df: DataFrame,
    k: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf exponent: OLS slope/intercept of ln(cnt) on ln(rank) over
    the top-``k`` tokens.  Returns one row ``(n, slope, intercept)``
    (slope is typically near -1 for natural text).  Counts/ranks are
    exact integers; the fit is the closed form over the bounded k-row
    top frame, rounded to 6dp.
    """
    from tits_spark.operators.vocab import vocab_topk

    top = vocab_topk(df, k=k, id_col=id_col, text_col=text_col)
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def novelty_ngrams(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty vs all EARLIER documents (id order).

    Returns ``(doc_id, n_ngrams, n_novel, novelty)``: distinct word
    n-grams in the document, how many first appear in it, and the
    ratio (6dp).  First-occurrence trick: novel iff the corpus-wide
    min(doc_id) of the n-gram is this document — one groupBy(ngram),
    one equi-join back, no prefix scans.
    """
    from tits_spark.operators.skew import ensure_min_parallelism

    grams = (
        ensure_min_parallelism(df)
        .select(
            id_col,
            F.explode(word_ngrams_col(F.col(text_col), n)).alias("ngram"),
        )
        .distinct()
    )
    first = grams.groupBy("ngram").agg(F.min(id_col).alias("_first"))
    per_doc = (
        grams.join(first, "ngram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_ngrams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_ngrams").cast("double"), 6
        ).alias("novelty"),
    )


def pmi_pairs(
    df: DataFrame,
    vocab_k: int = 300,
    min_pairs: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PMI of within-document token co-occurrence over the top-V vocab.

    Returns every pair with >= ``min_pairs`` co-occurrences:
    ``(tok_a, tok_b, n_ab, n_a, n_b, n_docs, pmi)`` where n_* are
    exact document frequencies and
    ``pmi = ln((n_ab * n_docs) / (n_a * n_b))`` rounded to 6dp — the
    products are exact BIGINTs, so both engines feed ln the identical
    double.

    The vocabulary cap is the scale lever: the self-join fan-out per
    document is bounded by C(|top-V ∩ doc|, 2), and the top-V filter
    is a broadcast semi-join on token.
    """
    from tits_spark.operators.vocab import vocab_topk

    top = vocab_topk(df, k=vocab_k, id_col=id_col, text_col=text_col).select(
        "token"
    )
    dt = (
        _exploded_tokens(df, id_col, text_col)
        .join(F.broadcast(top), "token")
        .distinct()
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df_cnt"))
    a = dt.select(F.col(id_col).alias("_d"), F.col("token").alias("tok_a"))
    b = dt.select(F.col(id_col).alias("_d"), F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "_d")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    fa = dfreq.select(
        F.col("token").alias("tok_a"), F.col("df_cnt").alias("n_a")
    )
    fb = dfreq.select(
        F.col("token").alias("tok_b"), F.col("df_cnt").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(fa), "tok_a")
        .join(F.broadcast(fb), "tok_b")
        .join(F.broadcast(n_docs))
    )
    pmi = F.round(
        F.log(
            (F.col("n_ab") * F.col("n_docs")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ),
        6,
    )
    return out.select(
        "tok_a", "tok_b", "n_ab", "n_a", "n_b", "n_docs", pmi.alias("pmi")
    )
