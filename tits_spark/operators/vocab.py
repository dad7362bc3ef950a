"""Corpus vocabulary statistics + unigram language-model scoring.

The two-pass pattern every tokenizer-training / quality-filtering
pipeline runs over the full corpus:

 1. :func:`token_counts` / :func:`vocab_topk` — global token frequency
    table (the seed vocabulary for BPE/unigram tokenizer training, and
    the frequency table CCNet-style quality filters use);
 2. :func:`unigram_logprob` — score every document by its mean token
    log-probability under the corpus unigram model. Low scores mark
    gibberish/boilerplate (far from the corpus distribution), very high
    scores mark degenerate repetition of frequent tokens — both are
    standard cut candidates.

Tokenization is the shared lowercased-alphanumeric scheme
(operators/decontam.py), identical to the ANSI-SQL form the oracle
runs.

Plan shapes at 100 TB:
 - token_counts: explode -> partial map-side count -> one hash
   aggregation keyed by token (vocab-sized output, corpus-sized input
   never re-shuffled afterwards);
 - vocab_topk: ``orderBy(count desc).limit(k)`` over the vocab-sized
   table — Catalyst plans TakeOrderedAndProject (per-partition heaps +
   single merge), not a global sort;
 - unigram_logprob: the exploded corpus joins the count table on
   token. The count table is vocab-sized (tens of millions of rows at
   web scale) — too big to broadcast blindly, so it stays a shuffle
   equi-join on a high-cardinality, naturally well-distributed key;
   pass ``broadcast_counts=True`` when a capped vocab is known small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens


def _exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from tits_spark.operators.skew import ensure_min_parallelism

    return ensure_min_parallelism(df).select(
        id_col, F.explode(_tokens(F.col(text_col))).alias("token")
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Global (token, cnt) frequency table over the corpus."""
    return (
        _exploded(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def vocab_topk(
    df: DataFrame, k: int = 1000, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-``k`` tokens by frequency: (token, cnt, rank), rank 1-based,
    ties broken by token ascending (deterministic)."""
    counts = token_counts(df, id_col, text_col)
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    # bounded-global-window: ranks the limit(k) frame above (<= k rows
    # on one task by construction) — NEVER lift this window onto the
    # unbounded counts frame
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select("token", "cnt", F.row_number().over(w).cast("int").alias("rank"))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_counts: bool = False,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus unigram
    model: avg over token occurrences of ln(cnt(token) / total_tokens).

    Every token of every document is in the model by construction (the
    model IS the corpus), so no smoothing is needed. Documents with no
    tokens are returned with ``n_tokens = 0`` and NULL score.

    Single-pass at corpus scale: the text is tokenized and exploded
    ONCE into per-doc token counts (doc_id, token, k) — the map-side
    partial agg collapses repeats before the shuffle — and both the
    global frequency table and the final weighted score
    (sum k*ln(p) / sum k == mean over occurrences) derive from that
    much smaller table; the raw occurrence stream is never shuffled
    and never re-read.

    Returns ``(id_col, n_tokens, logprob)``.
    """
    per_doc = (
        _exploded(df, id_col, text_col)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    counts = per_doc.groupBy("token").agg(F.sum("k").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("t"))
    if broadcast_counts:
        counts = F.broadcast(counts)
    scored = (
        per_doc.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_tokens"),
            (
                F.sum(F.col("k") * F.log(F.col("cnt") / F.col("t"))) / F.sum("k")
            ).alias("logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "logprob",
        )
    )


def word_bigrams_col(text_col):
    """Ordered word bigrams ("w1 w2") of the shared tokenizer's output;
    docs with < 2 tokens yield an empty array. Delegates to the
    bind-once n-gram device (operators/text.word_ngrams_col) — a naive
    per-position lambda re-tokenizes the text O(len^2)."""
    from tits_spark.operators.text import word_ngrams_col

    return word_ngrams_col(text_col, 2)


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus MLE
    bigram model: avg over bigram occurrences of
    ln(cnt(w1 w2) / cnt(w1 *)) — the conditional next-token likelihood,
    one order up from :func:`unigram_logprob`. As there, the model IS
    the corpus, so every document bigram has nonzero count and no
    smoothing is needed; repetitive boilerplate scores high, token
    salad scores low.

    Same single-pass shape: explode ONCE into per-doc bigram counts
    (map-side combine collapses repeats), derive the corpus bigram
    table and the prefix (w1) marginals from that smaller frame, join
    both back on their natural high-cardinality keys.

    Returns (id_col, n_bigrams, logprob) — docs with < 2 tokens keep
    n_bigrams = 0 and NULL logprob.
    """
    from tits_spark.operators.skew import ensure_min_parallelism

    per_doc = (
        ensure_min_parallelism(df)
        .select(id_col, F.explode(word_bigrams_col(F.col(text_col))).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bg_counts = per_doc.groupBy("bg").agg(F.sum("k").alias("cnt"))
    prefix = bg_counts.select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"), "cnt"
    ).groupBy("w1").agg(F.sum("cnt").alias("pcnt"))
    scored = (
        per_doc.join(bg_counts, "bg")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(prefix, "w1")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            (
                F.sum(F.col("k") * F.log(F.col("cnt") / F.col("pcnt")))
                / F.sum("k")
            ).alias("logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "logprob",
        )
    )
