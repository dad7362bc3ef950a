"""Quade test per key (Quade, JASA 1979; Conover, "Practical
Nonparametric Statistics" — public formulas): the range-weighted
Friedman. Friedman gives every complete week one vote on the weekday
ordering; Quade weights each week by the RANK OF ITS RANGE, so weeks
where the weekday effect is large dominate — strictly more powerful
than Friedman at k <= 5-ish treatments, and the last missing member
of the blocked-design family (friedman: unweighted, page_trend:
ordered alternative, quade: magnitude-weighted).

Built on friedman.weekday_cells' balanced complete-week design
(blk = epoch-week, trt = weekday, c = zero-filled daily count).
With doubled within-block midranks r2 (friedman's lattice), doubled
across-block range midranks q2 (ranges are exact ints; blocks ranked
per key), and the QUADRUPLED score

    s4 = q2 * (r2 - (k+1))          (= 4 * Q_i*(R_ij - (k+1)/2))

the Quade F clears to pure integers (the 16x scaling cancels):

    Sj  = sum_i s4_ij   per treatment          (exact)
    SB  = sum_j Sj^2                           (exact)
    A   = sum_ij s4^2                          (exact)
    F   = (n-1) * SB / (n*A - SB)   ~ F(k-1, (n-1)(k-1)) under H0

ONE double tree over exact decimal integers, round 6; keys with a
degenerate denominator (perfect concordance, n*A = SB) emit NULL.

Plan shape (100 TB): weekday_cells' one-scan spine -> within-block
rank window + per-block range agg -> ONE per-key equi-join of the
q2 block weights back onto the cells (both sides already hashed by
key) -> two nested hash aggs. No cartesian, no Python, no global
windows; every frame after the spine is bounded by weeks x 7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.friedman import K, weekday_cells

DEC = "decimal(38,0)"


def quade_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Per-key Quade test of weekday effect on daily event counts
    over complete weeks. Returns (key, n_blocks, sb, a4, quade_f);
    keys with fewer than ``min_blocks`` complete weeks drop and
    perfectly-concordant keys emit NULL quade_f."""
    cells = weekday_cells(df, key=key, ts=ts)
    wr = Window.partitionBy("key", "blk").orderBy("c")
    wt = Window.partitionBy("key", "blk", "c")
    ranked = cells.withColumn(
        "r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    ranges = cells.groupBy("key", "blk").agg(
        (F.max("c") - F.min("c")).alias("rng")
    )
    wq = Window.partitionBy("key").orderBy("rng")
    wqt = Window.partitionBy("key", "rng")
    weights = ranges.select(
        "key",
        "blk",
        (2 * F.rank().over(wq) + F.count(F.lit(1)).over(wqt) - 1).alias(
            "q2"
        ),
    )
    scored = ranked.join(weights, ["key", "blk"]).select(
        "key",
        "trt",
        (
            F.col("q2").cast(DEC) * (F.col("r2") - F.lit(K + 1))
        ).alias("s4"),
    )
    per_trt = scored.groupBy("key", "trt").agg(
        F.sum("s4").alias("sj"),
        F.sum((F.col("s4") * F.col("s4")).cast(DEC)).alias("a4p"),
        F.count(F.lit(1)).alias("n"),
    )
    per_key = (
        per_trt.groupBy("key")
        .agg(
            F.max("n").cast("long").alias("n_blocks"),
            F.sum((F.col("sj") * F.col("sj")).cast(DEC)).alias("_sb"),
            F.sum("a4p").alias("_a4"),
        )
        .filter(F.col("n_blocks") >= int(min_blocks))
    )
    n = F.col("n_blocks").cast(DEC)
    den = n * F.col("_a4") - F.col("_sb")
    fstat = F.when(
        den > 0,
        F.round(
            ((n - 1) * F.col("_sb")).cast("double") / den.cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return per_key.select(
        "key",
        "n_blocks",
        F.col("_sb").cast("long").alias("sb"),
        F.col("_a4").cast("long").alias("a4"),
        fstat.alias("quade_f"),
    )
