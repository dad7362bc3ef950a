"""Burrows' Delta stylometry per document — "how far is this doc's
STYLE from the corpus voice?" (Burrows 2002, Literary & Linguistic
Computing; public formula. The standard authorship-attribution
distance, here used as a curation signal: template/boilerplate and
machine-generated text sit at extreme Delta.)

Delta is the mean absolute z-score of the K most frequent corpus
words' RELATIVE frequencies: function-word usage is the stylistic
fingerprint content words can't fake. For doc d and marker word w,

    z(d,w) = (f(d,w) - mu_w) / sigma_w        Delta(d) = mean_w |z(d,w)|

Spark-shaped exactness and scale:

 - relative frequencies are quantized ONCE to the floor-1e9 lattice,
   f_q = floor(1e9 * tf / len) — exact int64, identical cross-engine;
 - the marker set is the top-K vocabulary by total corpus token count
   (tie: term ascending) — a BOUNDED top-k (TakeOrderedAndProject),
   broadcast back onto the (doc, term) counts, never a vocab shuffle;
   marker words with zero variance across docs (N*Q == S^2, an exact
   integer test) are dropped from the set deterministically;
 - per-word moments over ALL N docs: S_w = sum f_q, Q_w = sum f_q^2
   (decimal(38,0) — zero cells add nothing, so only PRESENT cells are
   ever materialized), and the cleared z needs no division by N:
   z = (N*f_q - S_w) / sqrt(N*Q_w - S_w^2);
 - the absent-word telescope: a doc missing marker w contributes the
   CONSTANT |z0_w| = S_w / sqrt(N*Q_w - S_w^2), so

       K_eff * Delta(d) = sum_{w present} (|z(d,w)| - |z0_w|) + Z0,
       Z0 = sum_w |z0_w|

   and the doc x K zero-fill grid NEVER exists — one bounded scalar
   (Z0, from the K-row stats frame) plus per-present-cell terms,
   each floor-1e9 quantized BEFORE the per-doc BIGINT sum (the
   mutual_info discipline). delta_u6 = floor((sum + Z0q)/(K_eff*1000))
   puts Delta on the 1e-6 lattice.

Plan shape: one corpus scan -> (doc, term) counts (one shuffle) ->
vocab totals -> bounded top-K -> broadcast equi-join -> K-row stats
frame (broadcast again) -> one per-doc hash aggregate, left-joined
back onto the doc spine so marker-free docs still score (they sit at
exactly Z0/K_eff). No doc x doc pair, no vocab-wide shuffle after the
cap, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens

DEC = "decimal(38,0)"


def burrows_delta(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_markers: int = 50,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document Burrows Delta against the corpus centroid over the
    ``k_markers`` most frequent words.

    Returns (doc_id, n_tokens, n_present, delta_u6): the doc length,
    how many marker words the doc uses, and Delta on the floor-1e6
    lattice. Token-free documents drop out. ``n_docs`` (the count of
    token-bearing docs) skips the counting job when the caller already
    knows it — pass it on the hot path (tfidf_weights' convention)."""
    kk = int(k_markers)
    if kk < 1:
        raise ValueError("burrows_delta needs k_markers >= 1")

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    # tf feeds three consumers (doc lengths, the top-K vocab, the
    # marker cells) and cells feeds two (stats, per-doc sums): persist
    # both so the corpus is tokenized ONCE, not re-derived per branch
    # (lexical.py's tfidf weights-frame lesson)
    tf = toks.groupBy("doc", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    doc_len = tf.groupBy("doc").agg(F.sum("tf").alias("len"))
    if n_docs is None:
        n_docs = doc_len.count()  # scalar corpus size (one bounded job)

    top = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .orderBy(F.col("ctf").desc(), F.col("term").asc())
        .limit(kk)
        .select("term")
    )
    cells = (
        tf.join(F.broadcast(top), "term")
        .join(doc_len, "doc")
        .select(
            "doc",
            "term",
            F.floor(
                F.lit(1e9) * F.col("tf").cast("double")
                / F.col("len").cast("double")
            ).cast("long").alias("fq"),
        )
        .persist()
    )
    stats = (
        cells.groupBy("term")
        .agg(
            F.sum(F.col("fq").cast(DEC)).alias("s"),
            F.sum(F.col("fq").cast(DEC) * F.col("fq")).alias("q"),
        )
        .withColumn(
            "var_num",
            F.lit(n_docs).cast(DEC) * F.col("q") - F.col("s") * F.col("s"),
        )
        .filter(F.col("var_num") > 0)  # exact-integer zero-variance drop
        .withColumn(
            "z0q",
            F.floor(
                F.lit(1e9)
                * F.col("s").cast("double")
                / F.sqrt(F.col("var_num").cast("double"))
            ).cast("long"),
        )
    )
    consts = stats.agg(
        F.count(F.lit(1)).alias("k_eff"), F.sum("z0q").alias("z0_total")
    )
    zn = (
        F.lit(n_docs).cast(DEC) * F.col("fq") - F.col("s")
    ).cast("double")
    cell_q = F.floor(
        F.lit(1e9)
        * (
            F.abs(zn / F.sqrt(F.col("var_num").cast("double")))
            - F.col("z0q").cast("double") / 1e9
        )
    ).cast("long")
    per_doc = (
        cells.join(F.broadcast(stats), "term")
        .select("doc", cell_q.alias("cq"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum("cq").alias("sq"),
        )
    )
    out = (
        doc_len.join(per_doc, "doc", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("doc").alias(id_col),
            F.col("len").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_present"), F.lit(0))
            .cast("long")
            .alias("n_present"),
            F.floor(
                (F.coalesce(F.col("sq"), F.lit(0)) + F.col("z0_total"))
                / (F.col("k_eff") * 1000.0)
            )
            .cast("long")
            .alias("delta_u6"),
        )
    )
    return out
