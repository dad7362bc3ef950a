"""Engle-Granger cointegration test between two irregular series on
the shared LOCF bucket grid — "do x and y share a common stochastic
trend?" The third member of the directed-predictability family
(granger.py: linear prediction; transfer_entropy.py: model-free
information flow; here: long-run equilibrium).

The classic two-step (Engle & Granger 1987, public formula):

    step 1:  y_t = alpha + beta * x_t + e_t        (static OLS)
    step 2:  Delta e_t = gamma * e_{t-1} + u_t      (Dickey-Fuller,
             no intercept — the residuals are mean-zero by step 1)
    t_DF = gamma / se(gamma); large negative => residuals revert =>
    cointegrated.

Exactness device (the granger.py discipline, one step further): the
residuals e_t = y_t - alpha - beta*x_t are DOUBLES, so their naive
sums would be partial-order-dependent — instead every residual sum
EXPANDS algebraically into the key's exact integer moment lattice:

    sum e_{t-1} e_t   = S_y0y1 - a*(S_y0+S_y1) - b*(S_y0x1+S_x0y1)
                        + n*a^2 + a*b*(S_x0+S_x1) + b^2*S_x0x1
    sum e_{t-1}^2     = S_y1y1 - 2a*S_y1 - 2b*S_x1y1 + n*a^2
                        + 2ab*S_x1 + b^2*S_x1x1          (etc.)

where every S_* is an exact decimal(38,0) sum of cent-lattice
products over (current, lag-1) grid pairs. Each S converts to double
exactly while below 2^53 (documented bound: ~20k buckets per key at
full 6-figure cent magnitudes — raise bucket_secs beyond that), and
alpha/beta/gamma/t_DF are then ONE fixed expression tree over those
exact doubles, identical on both engines, round(6), signed zero
normalized.

Plan: the shared grid (ONE raw scan, two exchanges, zero joins —
granger.locf_bucket_grid) plus ONE more hash aggregate per key: the
static-OLS moments and the pair moments are conditional sums in the
SAME groupBy, so step 1 and step 2 never re-scan anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid

DEC = "decimal(38,0)"


def engle_granger(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
    min_pairs: int = 8,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key Engle-Granger two-step on the LOCF bucket grid.

    Returns (key, n_obs, n_pairs, beta, alpha, gamma, df_t): the
    static-regression sample count (grid rows with both sides
    resolved), the Dickey-Fuller pair count, the hedge ratio and
    intercept (cents scale), the residual AR coefficient gamma and
    its t statistic (round 6; NULL when x is constant, the residual
    energy is zero, or fewer than ``min_pairs`` pairs resolve).
    """
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    wo = Window.partitionBy("key").orderBy("b")
    lag = grid.select(
        "key",
        F.col("xc").alias("x0"),
        F.col("yc").alias("y0"),
        F.lag("xc").over(wo).alias("x1"),
        F.lag("yc").over(wo).alias("y1"),
    ).filter(F.col("x0").isNotNull() & F.col("y0").isNotNull())

    d = lambda c: c.cast(DEC)  # noqa: E731
    pair = F.col("x1").isNotNull() & F.col("y1").isNotNull()

    def psum(expr):
        return F.sum(F.when(pair, expr).otherwise(F.lit(0)).cast(DEC))

    agg = lag.groupBy("key").agg(
        # static OLS moments over ALL resolved grid rows
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x0"))).alias("sx"),
        F.sum(d(F.col("y0"))).alias("sy"),
        F.sum((F.col("x0") * F.col("x0")).cast(DEC)).alias("sxx"),
        F.sum((F.col("x0") * F.col("y0")).cast(DEC)).alias("sxy"),
        # pair moments over rows whose lag also resolves
        F.sum(F.when(pair, 1).otherwise(0)).alias("np"),
        psum(F.col("x0")).alias("px0"),
        psum(F.col("x1")).alias("px1"),
        psum(F.col("y0")).alias("py0"),
        psum(F.col("y1")).alias("py1"),
        psum(F.col("x0") * F.col("x0")).alias("px0x0"),
        psum(F.col("x1") * F.col("x1")).alias("px1x1"),
        psum(F.col("x0") * F.col("x1")).alias("px0x1"),
        psum(F.col("y0") * F.col("y0")).alias("py0y0"),
        psum(F.col("y1") * F.col("y1")).alias("py1y1"),
        psum(F.col("y0") * F.col("y1")).alias("py0y1"),
        psum(F.col("x0") * F.col("y0")).alias("px0y0"),
        psum(F.col("x1") * F.col("y1")).alias("px1y1"),
        psum(F.col("x0") * F.col("y1")).alias("px0y1"),
        psum(F.col("x1") * F.col("y0")).alias("px1y0"),
    ).filter(F.col("np") >= int(min_pairs))

    def dd(name):
        return F.col(name).cast("double")

    n = dd("n")
    # step 1: beta/alpha from exact centered moments. Denominators go
    # through a null-when-degenerate CASE (NOT the raw column): under
    # ANSI mode Spark's common-subexpression elimination can evaluate
    # a shared division eagerly OUTSIDE its F.when guard, so a
    # constant-x key would raise DIVIDE_BY_ZERO instead of returning
    # NULL. The CASE leaves valid keys' values bit-identical and
    # propagates NULL for degenerate ones.
    mxx = n * dd("sxx") - dd("sx") * dd("sx")
    mxy = n * dd("sxy") - dd("sx") * dd("sy")
    mxx_safe = F.when(mxx > 0, mxx)
    b = mxy / mxx_safe
    a = (dd("sy") - b * dd("sx")) / n
    np_ = dd("np")

    # residual pair sums, expanded onto the exact integer lattice;
    # each written out explicitly so the tree is auditable and the
    # oracle SQL can mirror it token for token:
    s_e0e1 = (
        dd("py0y1")
        - a * (dd("py0") + dd("py1"))
        - b * (dd("px1y0") + dd("px0y1"))
        + np_ * (a * a)
        + (a * b) * (dd("px0") + dd("px1"))
        + (b * b) * dd("px0x1")
    )
    s_e1e1 = (
        dd("py1y1")
        - a * (dd("py1") + dd("py1"))
        - b * (dd("px1y1") + dd("px1y1"))
        + np_ * (a * a)
        + (a * b) * (dd("px1") + dd("px1"))
        + (b * b) * dd("px1x1")
    )
    s_e0e0 = (
        dd("py0y0")
        - a * (dd("py0") + dd("py0"))
        - b * (dd("px0y0") + dd("px0y0"))
        + np_ * (a * a)
        + (a * b) * (dd("px0") + dd("px0"))
        + (b * b) * dd("px0x0")
    )
    s_e1e1_safe = F.when(s_e1e1 > 0, s_e1e1)
    gamma = (s_e0e1 - s_e1e1) / s_e1e1_safe
    # sum (Delta e - gamma*e1)^2 = S(de^2) - gamma^2 * S(e1^2)
    s_de2 = s_e0e0 - 2.0 * s_e0e1 + s_e1e1
    sse = s_de2 - (gamma * gamma) * s_e1e1
    s2 = sse / (np_ - 1.0)
    df_t = gamma / F.sqrt(s2 / s_e1e1_safe)

    ok = (mxx > 0) & (s_e1e1 > 0)
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        F.col("np").cast("long").alias("n_pairs"),
        F.when(mxx > 0, F.round(b, 6) + F.lit(0.0)).alias("beta"),
        F.when(mxx > 0, F.round(a, 6) + F.lit(0.0)).alias("alpha"),
        F.when(ok, F.round(gamma, 6) + F.lit(0.0)).alias("gamma"),
        F.when(
            ok & (sse > 0) & (np_ > 1.0),
            F.round(df_t, 6) + F.lit(0.0),
        ).alias("df_t"),
    )
