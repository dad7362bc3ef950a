"""Ansari–Bradley two-sample scale test per key (Ansari & Bradley,
Ann. Math. Stat. 1960), weekend vs weekday: the classic rank-score
dispersion test that completes the repo's scale battery (conover_sq
squared ranks, mood squared deviations, cucconi/lepage combined) with
the folded-rank score the textbooks reach for first.  Score of pooled
position p is min(p, N+1-p) — small at both extremes, peaked in the
middle — so a sample concentrated in the tails scores LOW.

Everything runs on the per-key (cents) tie-grid cell level.  The
prefix mass of the score function has a closed form: with
h = floor((N+1)/2),

    f(x) = x(x+1)/2                                   for x <= h
    f(x) = h(h+1)/2 + (N-h)(N-h+1)/2 - (N-x)(N-x+1)/2 for x >  h

so a tie cell spanning pooled positions (b-t, b] carries exact
integer score mass cs = f(b) - f(b-t), every row in it gets midscore
cs/t, the A-sample statistic's cell contribution is ca*cs/t and the
squared-score mass is cs^2/t.  The two per-cell rationals are
QUANTIZED to the integer ppm lattice (the logrank/moran floor
device — floor(1e6 * term) with an identical double tree on both
engines) and summed as exact BIGINTs; S_tot = f(N) stays an exact
integer.  The conditional null moments given the tie pattern
(Hollander & Wolfe ch. 5):

    E[W]   = n1 * S_tot / N
    Var[W] = n1*n2*(N*sum s_i^2 - S_tot^2) / (N^2*(N-1))
    z      = (W - E[W]) / sqrt(Var[W])

are fixed double trees over (n1, n2, S_tot, W_ppm, ssq_ppm), round 6,
signed zero normalized; Var <= 0 (all scores equal) emits NULL z.

Plan shape (100 TB): one scan -> hash agg to the per-key tie grid ->
ONE (key)-window cumulative count -> one hash agg on the same
hash(key) exchange.  No joins, no Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _f(x: Column, n: Column, h: Column) -> Column:
    """Prefix score mass f(x) = sum_{p<=x} min(p, N+1-p), exact ints."""
    lo = F.shiftright(x * (x + 1), 1)
    hi = (
        F.shiftright(h * (h + 1), 1)
        + F.shiftright((n - h) * (n - h + 1), 1)
        - F.shiftright((n - x) * (n - x + 1), 1)
    )
    return F.when(x <= h, lo).otherwise(hi).cast("long")


def ansari_bradley(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 10,
) -> DataFrame:
    """Per-key Ansari-Bradley W between rows flagged ``is_a`` (sample
    1) and the rest.  Returns (key, n_a, n_b, s_tot, w_ppm, ssq_ppm,
    ab_z); keys with either sample under ``min_each`` drop and
    degenerate (zero-variance) keys emit NULL ab_z."""
    me = max(int(min_each), 2)
    a = F.when(F.col(is_a), 1).otherwise(0)
    grid = (
        df.select(
            F.col(key).alias("key"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
            a.alias("a"),
        )
        .groupBy("key", "c")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("key")
    t = F.col("ca") + F.col("cb")
    cum = grid.select(
        "key",
        "ca",
        "cb",
        t.alias("t"),
        F.sum(t).over(wcum).alias("b"),
        F.sum(t).over(wall).alias("n"),
    )
    n = F.col("n")
    h = F.shiftright(n + 1, 1)
    cs = (_f(F.col("b"), n, h) - _f(F.col("b") - F.col("t"), n, h)).cast(
        "double"
    )
    td = F.col("t").cast("double")
    agg = (
        cum.groupBy("key")
        .agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
            F.max("n").cast("long").alias("_n"),
            F.sum(
                F.floor(F.lit(1e6) * (F.col("ca").cast("double") * cs) / td)
            )
            .cast("long")
            .alias("w_ppm"),
            F.sum(F.floor(F.lit(1e6) * (cs * cs) / td))
            .cast("long")
            .alias("ssq_ppm"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    nn = F.col("_n")
    hh = F.shiftright(nn + 1, 1)
    s_tot = _f(nn, nn, hh)
    w = F.col("w_ppm").cast("double") / 1e6
    ssq = F.col("ssq_ppm").cast("double") / 1e6
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    nd = nn.cast("double")
    st = s_tot.cast("double")
    ew = n1 * st / nd
    var = (
        n1
        * n2
        * (nd * ssq - st * st)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = F.when(
        var > 0,
        F.round((w - ew) / F.sqrt(var), 6) + F.lit(0.0),
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        s_tot.alias("s_tot"),
        "w_ppm",
        "ssq_ppm",
        z.alias("ab_z"),
    )
