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

    # aggregate list built as SQL strings, one F.expr per column: at
    # ~1 ms per py4j round trip the Column-API form of these 20
    # conditional decimal sums cost more to BUILD than to run (guide
    # §1.2 — per-task work includes the driver's plan construction);
    # F.expr parses the identical expression tree in one call.
    _PAIR = "x1 IS NOT NULL AND y1 IS NOT NULL"

    def psum(sql_term: str) -> str:
        return (
            f"sum(CAST(CASE WHEN {_PAIR} THEN {sql_term} "
            f"ELSE 0 END AS {DEC}))"
        )

    agg = lag.groupBy("key").agg(
        # static OLS moments over ALL resolved grid rows
        F.expr("count(1)").alias("n"),
        F.expr(f"sum(CAST(x0 AS {DEC}))").alias("sx"),
        F.expr(f"sum(CAST(y0 AS {DEC}))").alias("sy"),
        F.expr(f"sum(CAST(x0 * x0 AS {DEC}))").alias("sxx"),
        F.expr(f"sum(CAST(x0 * y0 AS {DEC}))").alias("sxy"),
        # pair moments over rows whose lag also resolves
        F.expr(f"sum(CASE WHEN {_PAIR} THEN 1 ELSE 0 END)").alias("np"),
        F.expr(psum("x0")).alias("px0"),
        F.expr(psum("x1")).alias("px1"),
        F.expr(psum("y0")).alias("py0"),
        F.expr(psum("y1")).alias("py1"),
        F.expr(psum("x0 * x0")).alias("px0x0"),
        F.expr(psum("x1 * x1")).alias("px1x1"),
        F.expr(psum("x0 * x1")).alias("px0x1"),
        F.expr(psum("y0 * y0")).alias("py0y0"),
        F.expr(psum("y1 * y1")).alias("py1y1"),
        F.expr(psum("y0 * y1")).alias("py0y1"),
        F.expr(psum("x0 * y0")).alias("px0y0"),
        F.expr(psum("x1 * y1")).alias("px1y1"),
        F.expr(psum("x0 * y1")).alias("px0y1"),
        F.expr(psum("x1 * y0")).alias("px1y0"),
    ).filter(F.col("np") >= int(min_pairs))

    # Layered projections (the welch_anova r06 device): the closed-form
    # tail re-embedded b inside a, both inside every residual sum, and
    # gamma (itself embedding two residual sums) inside sse/df_t — a
    # multi-thousand-node Column tree costing ~0.9 s of py4j per call.
    # Each layer aliases a subtree once; every output's operation tree
    # and IEEE order are unchanged, nodes are just shared.
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
    b_expr = mxy / mxx_safe
    l1 = agg.select(
        "key", "n", "np",
        *[F.col(c) for c in (
            "px0", "px1", "py0", "py1", "px0x0", "px1x1", "px0x1",
            "py0y0", "py1y1", "py0y1", "px0y0", "px1y1", "px0y1", "px1y0",
        )],
        mxx.alias("_mxx"),
        b_expr.alias("_b"),
        ((dd("sy") - b_expr * dd("sx")) / n).alias("_a"),
    )
    b = F.col("_b")
    a = F.col("_a")
    np_ = F.col("np").cast("double")

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
    l2 = l1.select(
        "key", "n", "np", "_mxx", "_b", "_a",
        s_e0e1.alias("_se0e1"),
        s_e1e1.alias("_se1e1"),
        s_e0e0.alias("_se0e0"),
    )
    se0e1, se1e1, se0e0 = F.col("_se0e1"), F.col("_se1e1"), F.col("_se0e0")
    s_e1e1_safe = F.when(se1e1 > 0, se1e1)
    gamma_expr = (se0e1 - se1e1) / s_e1e1_safe
    # sum (Delta e - gamma*e1)^2 = S(de^2) - gamma^2 * S(e1^2)
    s_de2 = se0e0 - 2.0 * se0e1 + se1e1
    l3 = l2.select(
        "key", "n", "np", "_mxx", "_b", "_a", "_se1e1",
        gamma_expr.alias("_gamma"),
        (s_de2 - (gamma_expr * gamma_expr) * se1e1).alias("_sse"),
    )
    gamma, sse = F.col("_gamma"), F.col("_sse")
    np3 = F.col("np").cast("double")
    s2 = sse / (np3 - 1.0)
    se1e1_safe3 = F.when(F.col("_se1e1") > 0, F.col("_se1e1"))
    df_t = gamma / F.sqrt(s2 / se1e1_safe3)

    mxx3 = F.col("_mxx")
    ok = (mxx3 > 0) & (F.col("_se1e1") > 0)
    return l3.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        F.col("np").cast("long").alias("n_pairs"),
        F.when(mxx3 > 0, F.round(F.col("_b"), 6) + F.lit(0.0)).alias("beta"),
        F.when(mxx3 > 0, F.round(F.col("_a"), 6) + F.lit(0.0)).alias("alpha"),
        F.when(ok, F.round(gamma, 6) + F.lit(0.0)).alias("gamma"),
        F.when(
            ok & (sse > 0) & (np3 > 1.0),
            F.round(df_t, 6) + F.lit(0.0),
        ).alias("df_t"),
    )
