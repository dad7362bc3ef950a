"""Ordinal effect sizes per key — Cliff's delta (1993), the
Vargha-Delaney A measure (2000) and the dominance counts they share:
the SIZE companion of rank_tests.mann_whitney, which reports only a
significance score. A rollup pipeline that flags "weekend values
differ from weekday values, p < .01" still needs to say by HOW MUCH
in a unit-free way; delta/A are the standard robust answer (A is the
probability a random weekend draw exceeds a random weekday draw, ties
split).

Definitions over the exact pair-dominance counts gt = #{(a, b) :
a > b}, lt, eq across the two samples:

    delta = (gt - lt) / (n_a * n_b)          in [-1, 1]
    A     = (gt + eq/2) / (n_a * n_b)        in [0, 1]
          = (2*gt + eq) / (2 * n_a * n_b)

(delta coincides with the rank-biserial correlation and with
2*U_A/(n_a n_b) - 1 from mann_whitney's doubled-U — the families
cross-check on the same tie grid.)

Exactness: gt/lt/eq are accumulated from the per-key distinct-value
grid (rank_tests._tie_grid's shape) as sums of count products —
gt = sum_v ca(v) * cb_below(v) with cb_below one cumulative window —
in DECIMAL(38,0) (per-key sample sizes of 10^9 drive the products to
~10^18, the BIGINT edge; decimal keeps the lattice exact at any key
size). The two ratios are ONE double division each over exact
integers, round 6, signed-zero normalized.

Plan shape (100 TB): one hash aggregation collapses the raw stream to
the (key, value) grid BEFORE the single cumulative window (window
input = per-key distinct values, not raw rows), then one final hash
agg — no joins, no Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cliffs_delta(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
) -> DataFrame:
    """Cliff's delta + Vargha-Delaney A between the rows flagged
    ``is_a`` (sample A) and the rest (sample B), per key.

    Returns (key, n_a, n_b, n_gt, n_lt, n_eq, cliffs_delta, vd_a);
    keys where either sample is empty drop.
    """
    a = F.when(F.col(is_a), F.lit(1)).otherwise(F.lit(0))
    g = df.groupBy(key, value).agg(
        F.sum(a).alias("ca"),
        F.sum(F.lit(1) - a).alias("cb"),
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grid = g.select(
        key,
        "ca",
        "cb",
        (F.sum("cb").over(wcum) - F.col("cb")).alias("cb_below"),
        (F.sum("ca").over(wcum) - F.col("ca")).alias("ca_below"),
    )
    agg = grid.groupBy(key).agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(dec(F.col("ca")) * dec(F.col("cb_below"))).alias("gt"),
        F.sum(dec(F.col("cb")) * dec(F.col("ca_below"))).alias("lt"),
        F.sum(dec(F.col("ca")) * dec(F.col("cb"))).alias("eq"),
    )
    prod = dec(F.col("n_a")) * dec(F.col("n_b"))
    delta = F.round(
        (F.col("gt") - F.col("lt")).cast("double") / prod.cast("double"), 6
    ) + F.lit(0.0)
    vd_a = F.round(
        (2 * F.col("gt") + F.col("eq")).cast("double")
        / (F.lit(2.0) * prod.cast("double")),
        6,
    ) + F.lit(0.0)
    return agg.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        key,
        "n_a",
        "n_b",
        F.col("gt").cast("long").alias("n_gt"),
        F.col("lt").cast("long").alias("n_lt"),
        F.col("eq").cast("long").alias("n_eq"),
        delta.alias("cliffs_delta"),
        vd_a.alias("vd_a"),
    )


def welch_t(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 5,
) -> DataFrame:
    """Welch's unequal-variance t test (Welch, Biometrika 1947) with
    the Cohen's d / Hedges' g effect sizes, per key — the PARAMETRIC
    companion of this module's cliffs_delta and the rank battery
    (mann_whitney/brunner_munzel): when the analyst wants the
    mean-difference test and its standardized magnitude, not a rank
    statement.  All moments are exact integers on the cents lattice
    (n, S1, S2 per arm; one conditional-sum hash agg), and every
    readout is a fixed double tree over them:

        t  = (m1 - m2) / sqrt(v1/n1 + v2/n2)
        df = (v1/n1 + v2/n2)^2
             / ((v1/n1)^2/(n1-1) + (v2/n2)^2/(n2-1))   (Satterthwaite)
        d  = (m1 - m2) / s_pooled
        g  = d * (1 - 3/(4(n1+n2) - 9))                (Hedges 1981)

    (the cents scale cancels in t, d and g).  Round 6, signed zero
    normalized; zero pooled variance emits NULL t/d/g.

    Plan: ONE hash agg — no window, no join, no Python (the
    rayleigh-tier cheapest shape).

    Returns (key, n_a, n_b, mean_a, mean_b, welch_t, welch_df,
    cohens_d, hedges_g); keys with either arm under ``min_each``
    drop."""
    a = F.when(F.col(is_a), 1).otherwise(0).cast("long")
    c = F.round(F.col(value) * 100).cast("long")
    DEC = "decimal(38,0)"
    agg = (
        df.select(F.col(key).alias("key"), c.alias("c"), a.alias("a"))
        .groupBy("key")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(1 - F.col("a")).cast("long").alias("n_b"),
            F.sum(F.col("a") * F.col("c")).cast("long").alias("s1a"),
            F.sum((1 - F.col("a")) * F.col("c")).cast("long").alias("s1b"),
            F.sum(F.col("a").cast(DEC) * F.col("c") * F.col("c"))
            .alias("s2a"),
            F.sum((1 - F.col("a")).cast(DEC) * F.col("c") * F.col("c"))
            .alias("s2b"),
        )
        .filter(
            (F.col("n_a") >= int(min_each)) & (F.col("n_b") >= int(min_each))
        )
    )
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    m1 = F.col("s1a").cast("double") / n1
    m2 = F.col("s1b").cast("double") / n2
    v1 = (
        n1 * F.col("s2a").cast("double")
        - F.col("s1a").cast("double") * F.col("s1a").cast("double")
    ) / (n1 * (n1 - F.lit(1.0)))
    v2 = (
        n2 * F.col("s2b").cast("double")
        - F.col("s1b").cast("double") * F.col("s1b").cast("double")
    ) / (n2 * (n2 - F.lit(1.0)))
    se2 = v1 / n1 + v2 / n2
    t = F.when(se2 > 0, F.round((m1 - m2) / F.sqrt(se2), 6) + F.lit(0.0))
    dfree = F.when(
        se2 > 0,
        F.round(
            se2 * se2
            / (
                (v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
                + (v2 / n2) * (v2 / n2) / (n2 - F.lit(1.0))
            ),
            6,
        )
        + F.lit(0.0),
    )
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - F.lit(2.0))
    d = F.when(sp2 > 0, (m1 - m2) / F.sqrt(sp2))
    g = d * (
        F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (n1 + n2) - F.lit(9.0))
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        (F.round(m1 / F.lit(100.0), 6) + F.lit(0.0)).alias("mean_a"),
        (F.round(m2 / F.lit(100.0), 6) + F.lit(0.0)).alias("mean_b"),
        t.alias("welch_t"),
        dfree.alias("welch_df"),
        (F.round(d, 6) + F.lit(0.0)).alias("cohens_d"),
        (F.round(g, 6) + F.lit(0.0)).alias("hedges_g"),
    )
