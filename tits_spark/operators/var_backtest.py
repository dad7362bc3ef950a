"""Kupiec proportion-of-failures (POF) backtest per key — does a
historical-simulation VaR threshold actually get exceeded at its
nominal rate out of sample?

The validation partner of gpd_tail/hill_tail (which FIT the tail):
this tests the fitted quantile's out-of-sample calibration, the way a
risk or capacity model is actually audited. Public formula (Kupiec
1995): with x violations in n out-of-sample observations at nominal
exceedance probability p,

    LR = -2 ln[ (1-p)^(n-x) p^x / ((1-x/n)^(n-x) (x/n)^x) ]

~ chi2(1) under correct calibration (95% critical value 3.841).

Protocol: each key's tick sequence splits in half by time (the house
row_number determinism rule: order (us), ties impossible after the
(key, us) max-cents dedup). The threshold u is the COPIED order
statistic of the ESTIMATION half at integer rank ku = (99*n1)//100
(ascending (c, us) order — rank arithmetic only, no float quantile);
a violation is a TEST-half value strictly above u.

Exactness: u is a copied data value; x, n1, n2 are exact integer
counts; LR is one fixed double tree over exact integers (the x=0 and
x=n boundary terms vanish by the CASE guards, matching the x*ln(x)->0
limit). ln() may differ by an ulp across libm implementations — a
relative 1e-16 wobble against the 1e-6 rounding quantum at O(1..n)
magnitudes (the te/spectral_entropy precedent).

Plan shape (the 100 TB argument): ONE scan, ZERO joins, TWO
exchanges. The estimation half's rank does not need a separate branch
(which would re-scan the raw and join the threshold back): a single
window ordered by (is_test, c, us) sorts estimation rows FIRST, so
row_number restricted to the estimation half IS the estimation rank,
and the threshold broadcast is a plain windowed max over the same
hashpartitioning(key) the dedup/rn windows already established. The
final count aggregate rides the same partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def kupiec_pof(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    p_nominal: float = 0.01,
    min_obs: int = 40,
) -> DataFrame:
    """Per-key Kupiec POF backtest of the 99% historical VaR.

    Returns (key, n_est, n_test, u_cents, x_viol, viol_rate, lr_pof):
    split sizes, the copied threshold order statistic, the exact
    violation count, the violation share (one division of exact ints,
    round 6) and the Kupiec likelihood ratio (round 6). Keys with
    fewer than ``min_obs`` ticks drop.
    """
    pn = float(p_nominal)
    if not 0.0 < pn < 1.0:
        raise ValueError("p_nominal must be in (0, 1)")
    mo = max(int(min_obs), 8)

    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("us")
    base = ticks.select(
        "key",
        "us",
        "c",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("n") >= mo)

    n1 = floordiv(F.col("n"), 2)
    # estimation rows sort FIRST (is_test false < true), so row_number
    # restricted to them is the estimation-half rank — no branch/join
    wr = Window.partitionBy("key").orderBy(
        F.col("rn") > n1, F.asc("c"), F.asc("us")
    )
    ranked = base.select(
        "key",
        "c",
        (F.col("rn") > n1).alias("is_test"),
        n1.alias("n1"),
        F.row_number().over(wr).alias("rx"),
    )
    wk2 = Window.partitionBy("key")
    flagged = ranked.select(
        "key",
        "c",
        "is_test",
        "n1",
        F.max(
            F.when(
                (~F.col("is_test"))
                & (
                    F.col("rx")
                    == F.greatest(
                        floordiv(F.lit(99) * F.col("n1"), 100), F.lit(1)
                    )
                ),
                F.col("c"),
            )
        ).over(wk2).alias("u_cents"),
    )
    agg = (
        flagged.filter(F.col("is_test"))
        .groupBy("key")
        .agg(
            F.max("n1").alias("n_est"),
            F.max("u_cents").alias("u_cents"),
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("c") > F.col("u_cents"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("x_viol"),
        )
    )

    n_d = F.col("n_test").cast("double")
    x_d = F.col("x_viol").cast("double")
    ln1p = math.log(1.0 - pn)
    lnp = math.log(pn)
    # (n-x) * [ln(1-p) - ln(1 - x/n)]  — 0 when x = n
    term_nx = F.when(
        F.col("x_viol") < F.col("n_test"),
        (n_d - x_d) * (F.lit(ln1p) - F.log(F.lit(1.0) - x_d / n_d)),
    ).otherwise(F.lit(0.0))
    # x * [ln(p) - ln(x/n)]  — 0 when x = 0
    term_x = F.when(
        F.col("x_viol") > 0,
        x_d * (F.lit(lnp) - F.log(x_d / n_d)),
    ).otherwise(F.lit(0.0))
    lr = F.round(F.lit(-2.0) * (term_nx + term_x), 6)
    return agg.select(
        "key",
        F.col("n_est").cast("long").alias("n_est"),
        F.col("n_test").cast("long").alias("n_test"),
        "u_cents",
        F.col("x_viol").cast("long").alias("x_viol"),
        F.round(x_d / n_d, 6).alias("viol_rate"),
        lr.alias("lr_pof"),
    )
