"""Series complexity measures, fully declarative.

Permutation entropy (Bandt & Pompe, PRL 2002): the Shannon entropy of
the distribution of ORDER PATTERNS of m consecutive values — a robust,
scale-free complexity measure (low = predictable/monotone, high =
noisy), standard in anomaly triage. For m=3 the pattern of
(y1, y2, y3) is one of 6 permutations, identified by three pairwise
comparisons — pure lag-window + groupBy algebra, one shuffle, exact in
any engine (comparisons and integer counts only; the final entropy is
one log expression per pattern row).

Ties: resolved by order of appearance (earlier element ranks first on
equality — the original paper's convention), expressed as strict
comparisons in one fixed direction so both engines agree exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def permutation_entropy(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    normalize: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """(key, n_windows, perm_entropy) with order-3 patterns.

    ``normalize=True`` divides by ln(6) so 1.0 = white noise. Keys with
    fewer than 3 points are dropped.
    """
    w = Window.partitionBy(key).orderBy(ts, value)
    y1 = F.col(value)
    y2 = F.lead(value, 1).over(w)
    y3 = F.lead(value, 2).over(w)
    # pattern id from 3 pairwise strict comparisons; appearance-order
    # tie rule means "later strictly smaller" is what moves a rank
    pat = (
        (y2 < y1).cast("int") * 1
        + (y3 < y1).cast("int") * 2
        + (y3 < y2).cast("int") * 4
    )
    pats = (
        df.where(F.col(value).isNotNull())
        .withColumn("_p", pat)
        .where(F.col("_p").isNotNull())
        .groupBy(key, "_p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = pats.groupBy(key).agg(F.sum("cnt").alias("n_windows"))
    ent = (
        pats.join(tot, key)
        .groupBy(key)
        .agg(
            F.max("n_windows").alias("n_windows"),
            (-F.sum(
                (F.col("cnt") / F.col("n_windows"))
                * F.log(F.col("cnt") / F.col("n_windows"))
            )).alias("h"),
        )
    )
    h = F.col("h") / float(math.log(6)) if normalize else F.col("h")
    return ent.select(
        key, "n_windows", F.round(h, decimals).alias("perm_entropy")
    )


def distribution_entropy(
    df: DataFrame,
    key: str = "key",
    cat: str = "event_type",
    decimals: int = 6,
) -> DataFrame:
    """Shannon entropy of a categorical column's distribution per key
    (the VALUE-distribution counterpart of permutation_entropy, which
    measures ORDER structure): (key, n_obs, n_cats, type_entropy) with
    entropy normalized by ln(n_cats) (1.0 = uniform usage; keys with a
    single category emit 0). Same plan shape: two hash aggs on key —
    counts are exact integers, the entropy is one log expression per
    category row."""
    counts = (
        df.where(F.col(cat).isNotNull())
        .groupBy(key, cat)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy(key).agg(
        F.sum("cnt").alias("n_obs"), F.count(F.lit(1)).alias("n_cats")
    )
    ent = (
        counts.join(tot, key)
        .groupBy(key)
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max("n_cats").alias("n_cats"),
            (-F.sum(
                (F.col("cnt") / F.col("n_obs"))
                * F.log(F.col("cnt") / F.col("n_obs"))
            )).alias("h"),
        )
    )
    h = F.when(F.col("n_cats") > 1, F.col("h") / F.log(F.col("n_cats").cast("double"))).otherwise(F.lit(0.0))
    return ent.select(
        key, "n_obs", "n_cats", F.round(h, decimals).alias("type_entropy")
    )


def kl_vs_global(
    df: DataFrame,
    key: str = "key",
    cat: str = "event_type",
    decimals: int = 6,
) -> DataFrame:
    """KL divergence of each key's categorical mix from the corpus mix:
    D(p_key || p_global) = sum_c p ln(p/q) — the "how unusual is this
    entity's behaviour profile" score ([[distribution_entropy]]'s
    relative twin). q > 0 wherever p > 0 by construction (the global
    distribution aggregates the same counts), so the sum is always
    finite. Plan: the per-(key,cat) count table is aggregated once and
    reused for both distributions; the per-cat global table is tiny and
    broadcasts.
    """
    counts = (
        df.where(F.col(cat).isNotNull())
        .groupBy(key, cat)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy(key).agg(F.sum("cnt").alias("n_obs"))
    gcat = counts.groupBy(cat).agg(F.sum("cnt").alias("gcnt"))
    gtot = F.broadcast(gcat.agg(F.sum("gcnt").alias("gn")))
    joined = (
        counts.join(tot, key)
        .join(F.broadcast(gcat), cat)
        .crossJoin(gtot)
    )
    p = F.col("cnt") / F.col("n_obs")
    q = F.col("gcnt") / F.col("gn")
    return (
        joined.groupBy(key)
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.round(F.sum(p * F.log(p / q)), decimals).alias("kl"),
        )
    )


def entropy_rate(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    state: str = "event_type",
    order_tiebreak: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov entropy rate per key: the conditional entropy
    of the next state given the current one,

        H(Y|X) = - sum_{i,j} (c_ij / T) * ln(c_ij / c_i.)

    over the key's observed transition counts (``T`` transitions,
    ``c_i.`` the from-state row total). This is the sequence-
    PREDICTABILITY diagnostic completing the entropy family:
    :func:`distribution_entropy` scores the marginal mix,
    :func:`permutation_entropy` the numeric order patterns, and the
    entropy rate the categorical dynamics — 0 means the next state is
    a deterministic function of the current one (a scripted bot), high
    means memoryless switching.

    Also emits ``h_marg`` (the marginal next-state entropy over the
    same T transitions) so ``h_marg - h_rate`` reads directly as the
    one-step mutual information, and the normalized
    ``predictability = 1 - h_rate/h_marg`` (NULL when h_marg = 0).

    Exactness: counts are exact integers; each (i, j) row contributes
    one ratio pair and one ln; rounded to ``decimals``. Plan: one lag
    window keyed by the entity, one hash agg to (key, from, to)
    counts, co-partitioned windows for the (key, from) and (key)
    totals, one final hash agg — no joins, no Python.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    pairs = (
        df.where(F.col(state).isNotNull())
        .withColumn("_prev", F.lag(state).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(key, F.col("_prev").alias("_from"), F.col(state).alias("_to"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c_from = F.sum("c").over(Window.partitionBy(key, "_from"))
    c_to = F.sum("c").over(Window.partitionBy(key, "_to"))
    t_tot = F.sum("c").over(Window.partitionBy(key))
    cur = pairs.select(
        key,
        "c",
        c_from.alias("cf"),
        c_to.alias("ct"),
        t_tot.alias("t"),
    )
    agg = cur.groupBy(key).agg(
        F.max("t").alias("n_trans"),
        (-F.sum(
            (F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("cf"))
        )).alias("_hr"),
        # marginal next-state entropy: row weights c_ij sum over i to
        # the to-total, so sum_rows (c/T)*ln(ct/T) = sum_j (ct/T)ln(ct/T).
        (-F.sum(
            (F.col("c") / F.col("t")) * F.log(F.col("ct") / F.col("t"))
        )).alias("_hm"),
    )
    pred = F.when(
        F.round(F.col("_hm"), decimals) > 0,
        F.round(F.lit(1.0) - F.col("_hr") / F.col("_hm"), decimals),
    )
    return agg.select(
        key,
        "n_trans",
        F.round(F.col("_hr"), decimals).alias("h_rate"),
        F.round(F.col("_hm"), decimals).alias("h_marg"),
        pred.alias("predictability"),
    )
