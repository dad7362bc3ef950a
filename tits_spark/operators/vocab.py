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


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean interpolated Kneser-Ney bigram
    log-probability (Kneser & Ney, ICASSP 1995; Chen & Goodman 1998's
    interpolated form), the standard smoothed LM the MLE
    :func:`bigram_logprob` is the unsmoothed ceiling of:

        P_KN(w2|w1) = (c(w1 w2) - D)/c(w1 .)
                      + (D * N1+(w1 .)/c(w1 .)) * (N1+(. w2)/N1+(. .))

    with D = ``discount`` (0.75, exactly representable in binary),
    N1+(w1 .) the distinct-continuation count, N1+(. w2) the
    distinct-predecessor count — the continuation probability that
    makes KN the right smoother for skewed corpora (a word seen in
    many CONTEXTS backs off high, a word frequent in one boilerplate
    context does not).  Observed bigrams always have c >= 1 > D, so
    the max(., 0) clamp never binds on the scored rows.  Also emits
    the mean backoff mass lambda(w1) = D*N1+(w1 .)/c(w1 .) — the
    fraction of probability the model reserves for unseen
    continuations along the document (a boilerplate-detection
    readout on its own).

    Same plan as bigram_logprob: ONE explode into per-doc bigram
    counts; the bigram table, the w1 marginals (+ distinct
    continuations), the w2 predecessor counts and the 1-row type
    total all derive from that SMALLER frame; equi-joins on natural
    keys, the scalar total broadcast.  ln sums follow the
    bigram_logprob precedent (round 6 after the per-doc mean).

    Returns (id_col, n_bigrams, kn_logprob, backoff_mass); docs with
    < 2 tokens keep n_bigrams = 0 and NULL scores.
    """
    from tits_spark.operators.skew import ensure_min_parallelism

    dd = float(discount)
    per_doc = (
        ensure_min_parallelism(df)
        .select(
            id_col, F.explode(word_bigrams_col(F.col(text_col))).alias("bg")
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # five downstream frames derive from per_doc / bg_counts: persist
    # both (the lexical.py tfidf precedent) or the tokenize+explode
    # subtree re-runs once per reference — 5 corpus scans in the
    # un-persisted plan. At cluster scale these are the materialized
    # count tables an LM-training pipeline would write between stages.
    per_doc = per_doc.persist()
    bg_counts = (
        per_doc.groupBy("bg").agg(F.sum("k").alias("cnt")).persist()
    )
    w1s = (
        bg_counts.select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            "cnt",
        )
        .groupBy("w1")
        .agg(F.sum("cnt").alias("pcnt"), F.count(F.lit(1)).alias("ucnt"))
    )
    w2s = (
        bg_counts.select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2")
        )
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    tstats = bg_counts.agg(F.count(F.lit(1)).alias("tt"))
    lam = (F.lit(dd) * F.col("ucnt").cast("double")) / F.col("pcnt").cast(
        "double"
    )
    p = (
        (F.col("cnt").cast("double") - F.lit(dd))
        / F.col("pcnt").cast("double")
        + lam * (F.col("vcnt").cast("double") / F.col("tt").cast("double"))
    )
    scored = (
        per_doc.join(bg_counts, "bg")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
        .join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(tstats))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            (
                F.round(
                    F.sum(F.col("k") * F.log(p)) / F.sum("k"), 6
                )
                + F.lit(0.0)
            ).alias("kn_logprob"),
            (
                F.round(F.sum(F.col("k") * lam) / F.sum("k"), 6)
                + F.lit(0.0)
            ).alias("backoff_mass"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "kn_logprob",
            "backoff_mass",
        )
    )
