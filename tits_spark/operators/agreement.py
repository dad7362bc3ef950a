"""Inter-rater / paired-category agreement statistics over the
event-type stream: Cohen's kappa on consecutive-step transitions
(Cohen 1960), Bowker's symmetry test (Bowker, JASA 1948 — the k-class
generalization of McNemar), and Krippendorff's alpha restricted to
pairable units (Krippendorff 2004, nominal metric, m=2 coders per
unit).  Reference parity: the reference engine has no agreement
suite; these extend the repo's paired-categorical family (mcnemar,
chi2_indep, gk_gamma) with the three classic symmetric-design
readouts a transcript-quality dashboard wants (does the event stream
"agree with itself" one step ahead; is the transition matrix
symmetric; do a day's first two turns agree beyond chance).

All three run on exact integer lattices:

* kappa per key over transitions (a -> b) with N pairs, diagonal
  agreement D = sum_a n_aa and cross-marginal mass
  P = sum_a row_a * col_a:

      kappa = (N*D - P) / (N*N - P)

  N, D, P are exact BIGINTs; kappa is ONE double division, round 6,
  signed zero normalized.  Marginals are built join-free by the
  union-merge device: the lattice is unioned as (type-as-source,
  n, 0) + (type-as-target, 0, n), re-aggregated per (key, type) and
  reduced to P — no self-join of marginal frames.

* Bowker per key: for each unordered type pair {lo < hi} with
  n_fwd = n(lo->hi), n_rev = n(hi->lo), s = n_fwd + n_rev > 0,
  d = n_fwd - n_rev, the chi-square term d*d/s is a per-pair
  rational, so its naive double sum would be partial-order
  dependent; each term is instead QUANTIZED to the integer ppm
  lattice (the moran/staleness/logrank floor device):
  termq = floor(1e6 * d*d/s) with the identical double tree on both
  engines, then summed as exact BIGINT.  df = count of s>0 pairs.
  A 1e-6 term grain is far below any chi-square decision boundary.

* Krippendorff alpha (nominal, m=2): units are (key, day) with at
  least two events; the two "coders" are the day's first two events
  in the deterministic (ts, tiebreak) order.  With n units, u of
  them disagreeing, and pooled value counts n_c over the 2n coded
  values (P2 = (2n)^2 - sum_c n_c^2 the cross-category mass):

      alpha = 1 - (2n - 1) * 2u / P2

  exact integers end to end, one double tree.  Distinct from kappa:
  pooled (not per-rater) marginals plus the small-sample (2n-1)
  coincidence correction.

Plan shape (100 TB): one scan -> ONE (key)-window lead chain ->
hash agg to the (key, a, b) lattice (at most k^2 cells per key,
k = |type alphabet|) -> per-key reductions.  The only "join" anywhere
is the union-merge re-aggregation; no cartesian, no Python, no
global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def _transition_lattice(
    df: DataFrame,
    key: str,
    ts: str,
    state: str,
    tiebreak: str,
) -> DataFrame:
    """(key, a, b, n): consecutive-step transition counts per key in
    the deterministic (ts, tiebreak) total order."""
    w = Window.partitionBy("key").orderBy("_ts", "_tb")
    return (
        df.select(
            F.col(key).alias("key"),
            F.col(ts).alias("_ts"),
            F.col(tiebreak).alias("_tb"),
            F.col(state).alias("a"),
        )
        .withColumn("b", F.lead("a").over(w))
        .filter(F.col("b").isNotNull())
        .groupBy("key", "a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def transition_kappa(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str = "event_id",
    min_trans: int = 20,
) -> DataFrame:
    """Cohen's kappa of one-step self-agreement per key.

    Returns (key, n_trans, n_agree, pe_mass, kappa); keys with fewer
    than ``min_trans`` transitions drop.  kappa is NULL on the
    degenerate pe_mass == N^2 boundary (a single category)."""
    lat = _transition_lattice(df, key, ts, state, tiebreak)
    diag = lat.groupBy("key").agg(
        F.sum("n").alias("n_trans"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0)).alias(
            "n_agree"
        ),
    )
    # union-merge marginals: each lattice cell feeds its source type's
    # row-marginal and its target type's col-marginal
    marg = (
        lat.select("key", F.col("a").alias("t"), F.col("n").alias("ra"), F.lit(0).alias("ca"))
        .unionByName(
            lat.select("key", F.col("b").alias("t"), F.lit(0).alias("ra"), F.col("n").alias("ca"))
        )
        .groupBy("key", "t")
        .agg(F.sum("ra").alias("ra"), F.sum("ca").alias("ca"))
        .groupBy("key")
        .agg(F.sum(F.col("ra") * F.col("ca")).alias("pe_mass"))
    )
    j = diag.join(marg, "key").filter(F.col("n_trans") >= int(min_trans))
    nn = F.col("n_trans") * F.col("n_trans")
    kappa = F.when(
        nn != F.col("pe_mass"),
        F.round(
            (F.col("n_trans") * F.col("n_agree") - F.col("pe_mass")).cast(
                "double"
            )
            / (nn - F.col("pe_mass")).cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return j.select(
        "key",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("pe_mass").cast("long").alias("pe_mass"),
        kappa.alias("kappa"),
    )


def bowker_symmetry(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str = "event_id",
    min_trans: int = 20,
) -> DataFrame:
    """Bowker's test of transition-matrix symmetry per key.

    Returns (key, n_trans, bowker_df, chi2q_ppm, chi2): off-diagonal
    unordered pairs with traffic, the ppm-floored chi-square lattice
    sum and its double readout."""
    lat = _transition_lattice(df, key, ts, state, tiebreak)
    off = lat.filter(F.col("a") != F.col("b")).select(
        "key",
        F.least("a", "b").alias("lo"),
        F.greatest("a", "b").alias("hi"),
        F.when(F.col("a") < F.col("b"), F.col("n")).otherwise(0).alias("f"),
        F.when(F.col("a") > F.col("b"), F.col("n")).otherwise(0).alias("r"),
    )
    pairs = off.groupBy("key", "lo", "hi").agg(
        F.sum("f").alias("nf"), F.sum("r").alias("nr")
    )
    d = (F.col("nf") - F.col("nr")).cast("double")
    s = (F.col("nf") + F.col("nr")).cast("double")
    termq = F.floor(F.lit(1e6) * (d * d) / s).cast("long")
    per_key = pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("bowker_df"),
        F.sum(termq).alias("chi2q_ppm"),
    )
    tot = lat.groupBy("key").agg(F.sum("n").alias("n_trans"))
    j = per_key.join(tot, "key").filter(F.col("n_trans") >= int(min_trans))
    return j.select(
        "key",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.col("bowker_df").cast("long").alias("bowker_df"),
        F.col("chi2q_ppm").cast("long").alias("chi2q_ppm"),
        (
            F.round(F.col("chi2q_ppm").cast("double") / F.lit(1e6), 6)
            + F.lit(0.0)
        ).alias("chi2"),
    )


def krippendorff_m2(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str = "event_id",
    min_units: int = 5,
) -> DataFrame:
    """Krippendorff's alpha (nominal, m=2) per key over (key, day)
    units coded by the day's first two events.

    Returns (key, n_units, n_disagree, cross_mass, alpha); keys with
    fewer than ``min_units`` pairable days drop.  alpha is NULL when
    cross_mass == 0 (every coded value identical)."""
    w = Window.partitionBy("key", "_day").orderBy(ts, tiebreak)
    coded = (
        df.select(
            F.col(key).alias("key"),
            F.to_date(ts).alias("_day"),
            F.col(ts).alias(ts),
            F.col(tiebreak).alias(tiebreak),
            F.col(state).alias("v"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
    )
    units = (
        coded.groupBy("key", "_day")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.min(F.when(F.col("_rn") == 1, F.col("v"))).alias("v1"),
            F.min(F.when(F.col("_rn") == 2, F.col("v"))).alias("v2"),
        )
        .filter(F.col("m") == 2)
    )
    # per_key reads units once and the pooled value counts read it
    # twice more (the v1/v2 union) — persist so the raw scan + window
    # + unit aggregate run ONCE, not three times (the gk_gamma
    # persisted-lattice device; units is |key x day| rows, bounded)
    units = units.persist()
    per_key = units.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.when(F.col("v1") != F.col("v2"), 1).otherwise(0)).alias(
            "n_disagree"
        ),
    )
    # pooled value counts over the 2n coded values
    vals = units.select("key", F.col("v1").alias("v")).unionByName(
        units.select("key", F.col("v2").alias("v"))
    )
    pooled = (
        vals.groupBy("key", "v")
        .agg(F.count(F.lit(1)).alias("nc"))
        .groupBy("key")
        .agg(
            F.sum("nc").alias("_tot"),
            F.sum(F.col("nc") * F.col("nc")).alias("_sq"),
        )
        .select(
            "key",
            (F.col("_tot") * F.col("_tot") - F.col("_sq")).alias("cross_mass"),
        )
    )
    j = per_key.join(pooled, "key").filter(
        F.col("n_units") >= int(min_units)
    )
    alpha = F.when(
        F.col("cross_mass") > 0,
        F.round(
            F.lit(1.0)
            - (
                (2 * F.col("n_units") - 1) * 2 * F.col("n_disagree")
            ).cast("double")
            / F.col("cross_mass").cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return j.select(
        "key",
        F.col("n_units").cast("long").alias("n_units"),
        F.col("n_disagree").cast("long").alias("n_disagree"),
        F.col("cross_mass").cast("long").alias("cross_mass"),
        alpha.alias("alpha"),
    )


def transition_gwet_ac1(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    tiebreak: str = "event_id",
    min_trans: int = 20,
) -> DataFrame:
    """Gwet's AC1 on the same one-step transition design as
    :func:`transition_kappa` (Gwet, Br. J. Math. Stat. Psych. 2008):
    the paradox-resistant agreement coefficient — kappa collapses
    when marginals are skewed (high raw agreement, near-zero kappa);
    AC1's chance term uses the MEAN marginal pi_k = (row_k+col_k)/2N
    and stays calibrated.  With D = diagonal agreement, K = observed
    categories, m_k = row_k + col_k and G1 = sum_k m_k (2N - m_k),
    clearing the textbook denominators:

        AC1 = (4*N*(K-1)*D - G1) / (4*N^2*(K-1) - G1)

    exact BIGINTs end to end, one double division, round 6, signed
    zero normalized; the degenerate denominator (single category)
    emits NULL.  Same plan as kappa: lattice -> union-merge marginal
    frame -> per-key reduction; K falls out of the marginal frame's
    row count for free."""
    lat = _transition_lattice(df, key, ts, state, tiebreak)
    diag = lat.groupBy("key").agg(
        F.sum("n").alias("n_trans"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0)).alias(
            "n_agree"
        ),
    )
    marg = (
        lat.select("key", F.col("a").alias("t"), F.col("n").alias("m"))
        .unionByName(
            lat.select("key", F.col("b").alias("t"), F.col("n").alias("m"))
        )
        .groupBy("key", "t")
        .agg(F.sum("m").alias("m"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("k_cats"),
            F.sum(F.col("m") * F.col("m")).alias("m2"),
        )
    )
    j = diag.join(marg, "key").filter(F.col("n_trans") >= int(min_trans))
    nn = F.col("n_trans")
    # G1 = sum_k m_k (2N - m_k) = 4N^2 - sum m_k^2 (since sum m = 2N)
    g1 = 4 * nn * nn - F.col("m2")
    km1 = F.col("k_cats") - 1
    num = 4 * nn * km1 * F.col("n_agree") - g1
    den = 4 * nn * nn * km1 - g1
    ac1 = F.when(
        den != 0,
        F.round(num.cast("double") / den.cast("double"), 6) + F.lit(0.0),
    )
    return j.select(
        "key",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("k_cats").cast("long").alias("k_cats"),
        g1.cast("long").alias("g1_mass"),
        ac1.alias("ac1"),
    )
