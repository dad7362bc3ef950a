"""Conover squared-ranks test for equality of scale per key (Conover
& Iman 1981; Conover, "Practical Nonparametric Statistics" — public
formula), weekend vs weekday: rank the absolute deviations from each
sample's OWN center, square the ranks, and compare the a-sample's
squared-rank sum against its exchangeable-null moments. Completes
the scale column of the two-sample battery: brown_forsythe needs
means (moment-sensitive), lepage's Ansari half is linear-in-rank;
the squared-rank score weights large deviations hardest, the right
sensitivity for variance-style alternatives on heavy-ish data.

Center: each sample's own MEDIAN, the copied order statistic at rank
(n+1)//2 in the (cents, us) order (the conversation_stats device) —
exact, cross-engine bit-identical, and robust (Conover's classical
exposition uses the mean; the median variant keeps every deviation
an exact integer |c - med| instead of a rational |c - S/n|, which is
what makes combined ranking exact — documented deviation).

With doubled midranks rr of the deviations on the per-key tie grid
(lepage's device), s = rr^2 per distinct deviation and multiplicity
(ca, cb):

    T'  = sum_a s                            (exact, decimal)
    S1  = sum_all s,  S2 = sum_all s^2       (exact, decimal)
    A   = N*T' - n*S1                        (cleared numerator)
    B   = n*m*(N*S2 - S1^2)                  (cleared variance core)
    z   = A / sqrt(B / (N - 1))              (one double tree)

Exactness bound: s <= 4N^2 so N*S2 <= 16*N^6 — inside decimal(38,0)
below N ~ 1.2M rows/key (the same ballpark as cvm's N^3 emit
ceiling; documented). Everything before z is integer-exact; z is
round-6 with signed zero normalized.

Plan shape (100 TB): one scan -> per-(key,label) median via one
window rank + windowed copied order statistic (no join-back) ->
hash agg to the per-key deviation tie grid -> one cumulative window
over the grid -> final agg. No joins, no Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

DEC = "decimal(38,0)"


def squared_ranks_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key Conover squared-ranks scale test between rows flagged
    ``is_a`` and the rest, deviations taken from each sample's own
    median. Returns (key, n_a, n_b, t_sq, s1, z_sr); keys with
    either sample below ``min_each`` or a degenerate deviation grid
    (all deviations equal) drop."""
    me = max(int(min_each), 2)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    wr = Window.partitionBy("key", "a").orderBy("c", "us")
    wka = Window.partitionBy("key", "a")
    ranked = base.select(
        "key",
        "a",
        "c",
        F.row_number().over(wr).alias("_rk"),
        F.count(F.lit(1)).over(wka).alias("_no"),
    )
    med = F.max(
        F.when(
            F.col("_rk")
            == F.greatest(floordiv(F.col("_no") + 1, 2), F.lit(1)),
            F.col("c"),
        )
    ).over(wka)
    devs = ranked.select(
        "key", "a", F.abs(F.col("c") - med).alias("d")
    )
    grid = devs.groupBy("key", "d").agg(
        F.sum("a").alias("ca"),
        F.sum(F.lit(1) - F.col("a")).alias("cb"),
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col("ca") + F.col("cb")
    cum = grid.select(
        "key",
        "ca",
        "cb",
        (2 * (F.sum(t).over(wcum) - t) + t + 1).alias("rr"),
    )
    s = (F.col("rr").cast(DEC) * F.col("rr")).cast(DEC)
    agg = (
        cum.groupBy("key")
        .agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
            F.sum(F.col("ca").cast(DEC) * s).alias("_tsq"),
            F.sum((F.col("ca") + F.col("cb")).cast(DEC) * s).alias("_s1"),
            F.sum(
                ((F.col("ca") + F.col("cb")).cast(DEC) * s * s).cast(DEC)
            ).alias("_s2"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    n = F.col("n_a").cast(DEC)
    m = F.col("n_b").cast(DEC)
    nn = n + m
    a_num = nn * F.col("_tsq") - n * F.col("_s1")
    b_num = (n * m).cast(DEC) * (
        nn * F.col("_s2") - (F.col("_s1") * F.col("_s1")).cast(DEC)
    )
    z = F.when(
        b_num > 0,
        F.round(
            a_num.cast("double")
            / F.sqrt(b_num.cast("double") / (nn - 1).cast("double")),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("_tsq").cast("long").alias("t_sq"),
        F.col("_s1").cast("long").alias("s1"),
        z.alias("z_sr"),
    ).filter(F.col("z_sr").isNotNull())
