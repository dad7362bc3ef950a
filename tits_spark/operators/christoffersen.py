"""Christoffersen (1998) independence + conditional-coverage VaR
backtest per key — the clustering complement of var_backtest's Kupiec
POF: POF asks whether violations happen at the right RATE,
Christoffersen asks whether they happen at the right TIMES (a
well-calibrated threshold with violations bunched into bursts still
fails risk audit, and burst-clustered SLA breaches are exactly what a
capacity model misses).

Protocol is var_backtest's verbatim (same split, same copied
order-statistic threshold u at estimation rank (99*n1)//100, same
strict-violation rule), then the TEST half's violation indicator
sequence i_t in time order yields the four exact transition counts

    n00, n01, n10, n11   (n_ab = #{t : i_{t-1} = a, i_t = b})

over the n_test - 1 adjacent pairs. With pi = (n01+n11)/sum,
pi0 = n01/(n00+n01), pi1 = n11/(n10+n11), the independence LR is

    LR_ind = -2 ln[ (1-pi)^(n00+n10) pi^(n01+n11) ]
             +2 ln[ (1-pi0)^n00 pi0^n01 (1-pi1)^n10 pi1^n11 ]

~ chi2(1) under a memoryless violation process; LR_cc = LR_pof +
LR_ind ~ chi2(2) is the joint conditional-coverage test (Kupiec's
term recomputed here on the SAME integers the var_backtest family
emits, so the two families cross-check). Boundary cells contribute
their x*ln(x) -> 0 limits via CASE guards (pi1 undefined when no
violation has a successor: LR_ind reported NULL then, the standard
small-sample fallback).

Exactness: every input to the double trees is an exact BIGINT count;
ln() libm ulp wobble vs the 1e-6 rounding quantum is the
te/var_backtest precedent.

Plan shape (the 100 TB argument): ONE scan, ZERO joins — the
var_backtest boolean-first window trick computes the estimation rank
and threshold inside the same hashpartitioning(key) chain, the
violation lag is one more window over that partitioning, and the
final aggregate rides it too. No cartesian, no Python, no global
window (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def christoffersen(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    p_nominal: float = 0.01,
    min_obs: int = 40,
) -> DataFrame:
    """Per-key Christoffersen independence + conditional coverage.

    Returns (key, n_test, x_viol, n00, n01, n10, n11, lr_pof, lr_ind,
    lr_cc): the exact transition counts, Kupiec's LR on the same
    integers, the independence LR (NULL when a violation never has a
    successor pair, i.e. n10 + n11 = 0 or n00 + n01 = 0), and their
    sum. Keys with fewer than ``min_obs`` ticks drop.
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
    wr = Window.partitionBy("key").orderBy(
        F.col("rn") > n1, F.asc("c"), F.asc("us")
    )
    ranked = base.select(
        "key",
        "us",
        "c",
        (F.col("rn") > n1).alias("is_test"),
        n1.alias("n1"),
        F.row_number().over(wr).alias("rx"),
    )
    wk2 = Window.partitionBy("key")
    flagged = ranked.select(
        "key",
        "us",
        "c",
        "is_test",
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
    viol = flagged.filter(F.col("is_test")).select(
        "key",
        "us",
        (F.col("c") > F.col("u_cents")).cast("int").alias("i"),
    )
    wv = Window.partitionBy("key").orderBy("us")
    pairs = viol.select(
        "key", "i", F.lag("i").over(wv).alias("ip")
    )
    agg = pairs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("i").alias("x_viol"),
        F.sum(
            F.when((F.col("ip") == 0) & (F.col("i") == 0), 1).otherwise(0)
        ).alias("n00"),
        F.sum(
            F.when((F.col("ip") == 0) & (F.col("i") == 1), 1).otherwise(0)
        ).alias("n01"),
        F.sum(
            F.when((F.col("ip") == 1) & (F.col("i") == 0), 1).otherwise(0)
        ).alias("n10"),
        F.sum(
            F.when((F.col("ip") == 1) & (F.col("i") == 1), 1).otherwise(0)
        ).alias("n11"),
    )

    # ---- LR_pof on the same integers (Kupiec's tree, ref
    # var_backtest.kupiec_pof) -------------------------------------
    n_d = F.col("n_test").cast("double")
    x_d = F.col("x_viol").cast("double")
    ln1p = math.log(1.0 - pn)
    lnp = math.log(pn)
    term_nx = F.when(
        F.col("x_viol") < F.col("n_test"),
        (n_d - x_d) * (F.lit(ln1p) - F.log(F.lit(1.0) - x_d / n_d)),
    ).otherwise(F.lit(0.0))
    term_x = F.when(
        F.col("x_viol") > 0,
        x_d * (F.lit(lnp) - F.log(x_d / n_d)),
    ).otherwise(F.lit(0.0))
    lr_pof = F.round(F.lit(-2.0) * (term_nx + term_x), 6) + F.lit(0.0)

    # ---- LR_ind over the transition counts ------------------------
    m00, m01 = F.col("n00").cast("double"), F.col("n01").cast("double")
    m10, m11 = F.col("n10").cast("double"), F.col("n11").cast("double")
    mall = m00 + m01 + m10 + m11
    pi = (m01 + m11) / mall
    pi0 = m01 / (m00 + m01)
    pi1 = m11 / (m10 + m11)

    def _xlnx(cnt, p):  # cnt * ln(p), 0 when cnt = 0 (its limit)
        return F.when(cnt > 0, cnt.cast("double") * F.log(p)).otherwise(
            F.lit(0.0)
        )

    ll_null = _xlnx(F.col("n00") + F.col("n10"), F.lit(1.0) - pi) + _xlnx(
        F.col("n01") + F.col("n11"), pi
    )
    ll_alt = (
        _xlnx(F.col("n00"), F.lit(1.0) - pi0)
        + _xlnx(F.col("n01"), pi0)
        + _xlnx(F.col("n10"), F.lit(1.0) - pi1)
        + _xlnx(F.col("n11"), pi1)
    )
    defined = (
        (F.col("n00") + F.col("n01") > 0)
        & (F.col("n10") + F.col("n11") > 0)
    )
    lr_ind = F.when(
        defined, F.round(F.lit(2.0) * (ll_alt - ll_null), 6) + F.lit(0.0)
    )
    return agg.select(
        "key",
        F.col("n_test").cast("long").alias("n_test"),
        F.col("x_viol").cast("long").alias("x_viol"),
        F.col("n00").cast("long").alias("n00"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n11").cast("long").alias("n11"),
        lr_pof.alias("lr_pof"),
        lr_ind.alias("lr_ind"),
        # no second round(): the sum of two already-rounded doubles is
        # the same double on both engines; re-rounding would reopen
        # the half-boundary tie window for nothing
        F.when(defined, lr_pof + lr_ind + F.lit(0.0)).alias("lr_cc"),
    )
