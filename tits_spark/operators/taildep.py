"""Empirical tail-dependence coefficients of two irregular series on
the shared LOCF grid — do X and Y crash (or spike) TOGETHER?

The tail counterpart of the dependence suite (kendall tau measures
bulk concordance, granger/transfer entropy directed prediction,
hy_cov covariance): correlation can be near zero while extremes are
perfectly synchronized, and it is exactly the joint-extreme behavior
that decides portfolio/capacity co-failure risk. Public estimator
(empirical copula tail counts, e.g. Frahm-Junker-Schmidt 2005): with
per-key order statistics x_(k), y_(k) at level q,

    lambda_U = P(Y > y_(k) | X > x_(k)) ~ #{x>x_(k) AND y>y_(k)} / #{x>x_(k)}
    lambda_L = P(Y < y_(k') | X < x_(k'))  symmetrically at 1-q

lambda ~ q-invariant and > 0 indicates asymptotic tail dependence;
lambda ~ (1-q)-proportional indicates independence-like tails.

Alignment is tits-style: hourly last-in-bucket + LOCF over the joint
span (granger.locf_bucket_grid — identical determinism rules), rows
where both sides are resolved.

Exactness: the thresholds are COPIED data values on the cents lattice
(rank arithmetic only: the k-th smallest under the deterministic
(value, bucket) tie order, k = (9n)//10 by INTEGER floor division —
no float quantile anywhere), and all six surfaces are exact integer
counts. The two lambdas are single divisions of exact ints, round 6.

Plan shape (the 100 TB argument): the grid is one raw scan + two
exchanges; both rank windows, the threshold-broadcast window and the
final groupBy all ride the same hashpartitioning(key) — no further
exchange, no join, no UDF, and the per-key state is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv
from tits_spark.operators.granger import locf_bucket_grid


def tail_dependence(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
    min_obs: int = 50,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key empirical upper/lower tail dependence at q = 0.9 / 0.1.

    ``grid`` accepts a pre-built (persisted) locf_bucket_grid so the
    causality job can share ONE raw scan across all grid consumers
    (the granger/kendall precedent).

    Returns (key, n_grid, xu, yu, xl, yl, n_xu, ju, n_xl, jl,
    lambda_u, lambda_l): the joint-grid length, the four copied
    threshold order statistics (cents), the marginal and joint
    exceedance counts, and the two conditional tail-dependence shares
    (round 6; NULL when the marginal count is 0, e.g. massive ties).
    Keys with fewer than ``min_obs`` joint buckets are dropped.
    """
    mo = max(int(min_obs), 10)
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    grid = grid.filter(F.col("xc").isNotNull() & F.col("yc").isNotNull())

    wk = Window.partitionBy("key")
    wx = Window.partitionBy("key").orderBy(F.asc("xc"), F.asc("b"))
    wy = Window.partitionBy("key").orderBy(F.asc("yc"), F.asc("b"))
    t1 = grid.select(
        "key",
        "b",
        "xc",
        "yc",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    ku = floordiv(F.lit(9) * F.col("n"), 10)
    kd = F.col("n") - ku + F.lit(1)
    t2 = t1.select(
        "key",
        "xc",
        "yc",
        "n",
        F.max(F.when(F.col("rx") == ku, F.col("xc"))).over(wk).alias("xu"),
        F.max(F.when(F.col("ry") == ku, F.col("yc"))).over(wk).alias("yu"),
        F.max(F.when(F.col("rx") == kd, F.col("xc"))).over(wk).alias("xl"),
        F.max(F.when(F.col("ry") == kd, F.col("yc"))).over(wk).alias("yl"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    agg = (
        t2.groupBy("key")
        .agg(
            F.max("n").alias("n_grid"),
            F.max("xu").alias("xu"),
            F.max("yu").alias("yu"),
            F.max("xl").alias("xl"),
            F.max("yl").alias("yl"),
            F.sum(
                F.when(F.col("xc") > F.col("xu"), one).otherwise(zero)
            ).alias("n_xu"),
            F.sum(
                F.when(
                    (F.col("xc") > F.col("xu")) & (F.col("yc") > F.col("yu")),
                    one,
                ).otherwise(zero)
            ).alias("ju"),
            F.sum(
                F.when(F.col("xc") < F.col("xl"), one).otherwise(zero)
            ).alias("n_xl"),
            F.sum(
                F.when(
                    (F.col("xc") < F.col("xl")) & (F.col("yc") < F.col("yl")),
                    one,
                ).otherwise(zero)
            ).alias("jl"),
        )
        .filter(F.col("n_grid") >= mo)
    )
    lam_u = F.when(
        F.col("n_xu") > 0,
        F.round(F.col("ju").cast("double") / F.col("n_xu").cast("double"), 6),
    )
    lam_l = F.when(
        F.col("n_xl") > 0,
        F.round(F.col("jl").cast("double") / F.col("n_xl").cast("double"), 6),
    )
    return agg.select(
        "key",
        F.col("n_grid").cast("long").alias("n_grid"),
        "xu",
        "yu",
        "xl",
        "yl",
        F.col("n_xu").cast("long").alias("n_xu"),
        F.col("ju").cast("long").alias("ju"),
        F.col("n_xl").cast("long").alias("n_xl"),
        F.col("jl").cast("long").alias("jl"),
        lam_u.alias("lambda_u"),
        lam_l.alias("lambda_l"),
    )
