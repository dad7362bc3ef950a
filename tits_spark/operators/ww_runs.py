"""Two-sample Wald-Wolfowitz runs test (1940) and the Lepage (1971)
joint location-scale test per key, weekend vs weekday values — the
omnibus nonparametric pair completing rank_tests: mann_whitney sees
location, brown_forsythe sees scale, WW-runs and Lepage see EITHER
(runs: any distributional difference shortens label runs in the
merged order; Lepage: Wilcoxon^2 + Ansari-Bradley^2, each chi2(1)
summand targeting one moment).

## WW runs

Merge both samples in the deterministic (cents, us) total order
(ties broken by timestamp — the house total-order rule; classic WW
assumes no ties, this pins them reproducibly) and count label runs R.
With n1, n2 (N = n1 + n2):

    mu  = 2*n1*n2/N + 1
    var = 2*n1*n2*(2*n1*n2 - N) / (N^2*(N-1))
    z   = (R - mu) / sqrt(var)      (clustering -> R small -> z < 0)

## Lepage

On the per-key distinct-value tie grid (rank_tests' machinery):
Wilcoxon via the doubled-midrank sum (mann_whitney's u2), Ansari-
Bradley via DOUBLED midrank AB scores 2*s = min(rr, 2*(N+1) - rr)
(rr = 2*midrank; exact BIGINT). With exact moments (Ansari-Bradley
1960 tie-free forms; the doubled lattice clears the halves):

  N even: E[2A] = n1*(N+2)/2,
          var(4A) = 4*n1*n2*(N+2)*(N-2)/(N-1)... (cleared, see code)
  N odd:  E[2A] = n1*(N+1)^2/(2N) -> cleared onto the 2N lattice

    lepage = zW^2 + zAB^2    ~ chi2(2)

Exactness: R, n1, n2, u2, the doubled AB sum and every cleared
moment are exact integers (DECIMAL(38,0) where products stack); each
z is one double tree, round 6. Tie caveat: the classic AB variance
is used (tie-corrected AB variance needs sum s^2 — emitted too so a
future correction is pure algebra); the statistic is DEFINED on this
deterministic surface, the house rule for tied nonparametrics.

Plan shape (100 TB): WW is one (key)-window lag over the merged
order + one agg; Lepage is the tie-grid hash agg + cumulative window
+ final agg. No joins, no Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def ww_runs_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_obs: int = 20,
) -> DataFrame:
    """Per-key two-sample runs test between rows flagged ``is_a`` and
    the rest. Returns (key, n_a, n_b, runs, z); keys with an empty
    sample or fewer than ``min_obs`` rows drop."""
    mo = max(int(min_obs), 4)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    wo = Window.partitionBy("key").orderBy("c", "us")
    runs = base.select(
        "key",
        "a",
        F.when(
            F.lag("a").over(wo).isNull()
            | (F.lag("a").over(wo) != F.col("a")),
            1,
        ).otherwise(0).alias("chg"),
    )
    agg = runs.groupBy("key").agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("a")).cast("long").alias("n_b"),
        F.sum("chg").cast("long").alias("runs"),
    ).filter(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
        & (F.col("n_a") + F.col("n_b") >= mo)
    )
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    nn = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / nn + F.lit(1.0)
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - nn)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    z = F.when(
        var > 0,
        F.round((F.col("runs").cast("double") - mu) / F.sqrt(var), 6)
        + F.lit(0.0),
    )
    return agg.select("key", "n_a", "n_b", "runs", z.alias("z"))


def lepage_test(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key Lepage joint location-scale statistic.

    Returns (key, n_a, n_b, u2, ab2, z_w, z_ab, lepage): the doubled
    Wilcoxon U and doubled AB score sum (exact), the two z-scores and
    their squared sum (round 6; NULL when a variance vanishes). Keys
    with either sample below ``min_each`` drop."""
    me = max(int(min_each), 2)
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
    wk = Window.partitionBy(key)
    t = F.col("ca") + F.col("cb")
    grid = g.select(
        key,
        "ca",
        "cb",
        (2 * (F.sum(t).over(wcum) - t) + t + 1).alias("rr"),
        F.sum(F.col("ca") + F.col("cb")).over(wk).alias("n"),
    )
    # doubled AB score: 2s = min(rr, 2*(N+1) - rr)
    s2 = F.least(F.col("rr"), 2 * (F.col("n") + 1) - F.col("rr"))
    agg = grid.groupBy(key).agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca").cast(DEC) * F.col("rr")).alias("r2_a"),
        F.sum(F.col("ca").cast(DEC) * s2).alias("ab2"),
    ).filter((F.col("n_a") >= me) & (F.col("n_b") >= me))

    n1d = F.col("n_a").cast("double")
    n2d = F.col("n_b").cast("double")
    nd = n1d + n2d
    n_l = F.col("n_a") + F.col("n_b")
    # Wilcoxon: u2 = r2_a - n_a*(n_a+1) (doubled U), E[u2] = n_a*n_b,
    # var(u2) = 4 * n_a*n_b*(N+1)/12 (tie-free form; ties pinned by
    # the deterministic grid)
    u2 = (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2")
    var_u2 = n1d * n2d * (nd + 1) / F.lit(3.0)
    z_w = (
        (F.col("u2").cast("double") - n1d * n2d) / F.sqrt(var_u2)
    )
    # Ansari-Bradley on the doubled lattice (2A = ab2):
    even = (n_l % 2) == 0
    e_ab2 = F.when(even, n1d * (nd + 2) / F.lit(2.0)).otherwise(
        n1d * (nd + 1) * (nd + 1) / (F.lit(2.0) * nd)
    )
    var_ab2 = F.when(
        even,
        n1d * n2d * (nd + 2) * (nd - 2) / (F.lit(12.0) * (nd - 1)),
    ).otherwise(
        n1d * n2d * (nd + 1) * (F.lit(3.0) + nd * nd)
        / (F.lit(12.0) * nd * nd)
    )
    z_ab = (F.col("ab2").cast("double") - e_ab2) / F.sqrt(var_ab2)
    ok = (var_u2 > 0) & (var_ab2 > 0)
    out = agg.withColumn("u2", u2)
    return out.select(
        key,
        "n_a",
        "n_b",
        F.col("u2").cast("long").alias("u2"),
        F.col("ab2").cast("long").alias("ab2"),
        F.when(ok, F.round(z_w, 6) + F.lit(0.0)).alias("z_w"),
        F.when(ok, F.round(z_ab, 6) + F.lit(0.0)).alias("z_ab"),
        F.when(ok, F.round(z_w * z_w + z_ab * z_ab, 6) + F.lit(0.0)).alias(
            "lepage"
        ),
    )
