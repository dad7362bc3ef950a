"""Integrated autocorrelation time + effective sample size per key.

The MCMC/ergodic-average diagnostic (Sokal's lecture-notes estimator,
public formula) with a fixed lag window M:

    tau_int = 1 + 2 * sum_{k=1..M} rho_k,      ESS = n / tau_int

where rho_k is the stationary ACF estimate
sum_i (x_i - xbar)(x_{i+k} - xbar) / sum_i (x_i - xbar)^2. A series of
n correlated observations carries only ~n/tau_int independent samples —
the number that actually matters when averaging a monitored metric.

Exactness device (the repo's integer-moment discipline): with cents
c_i and per-key totals (S, n), the demeaned value scaled by n is
d_i = n*c_i - S — an exact BIGINT. Both the lag products and the
variance are then integer sums, and because every rho_k shares the
SAME denominator sum(d^2), the k-sum collapses into ONE exact integer
numerator N = sum_{k<=M} sum_i d_i * d_{i+k}:

    tau_int = 1 + 2 * (N / D)   — a single double division per key.

No float aggregation anywhere; partial-agg order cannot perturb the
result (decimal(38,0) sums on the Spark side, HUGEINT in the oracle).

Plan shape: one window shuffle on key for (S, n, rn); the lag pairing
is an EXPLODE of k=1..M followed by an equi-join on (key, rn) — never
a range join, 20x rows through one hash join, linear in the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def iact_by_key(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    max_lag: int = 20,
) -> DataFrame:
    """Per-key tau_int and ESS over lags 1..max_lag. Returns
    (key, n, tau_u6, ess_u6) on the floor-1e6 lattice; constant series
    (zero variance) drop out, non-mixing series with tau <= 0 keep
    tau and report NULL ESS."""
    m = int(max_lag)
    cents = F.round(F.col(value) * 100).cast("long")
    w = Window.partitionBy(key)
    # tiebreak on the cents lattice (c is all the statistic sees, so
    # any order among cent-equal simultaneous rows gives equal output)
    wo = Window.partitionBy(key).orderBy("ts", "c")
    base = (
        df.select(F.col(key).alias("key"), F.col(ts).alias("ts"), cents.alias("c"))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("c").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .select("key", "rn", "n", (F.col("n") * F.col("c") - F.col("s")).alias("d"))
    )
    # r06: the variance denominator rides the SAME probe join as the
    # lag numerators — each row also emits a k=0 probe that matches
    # itself, contributing d*d to a conditional sum. The old separate
    # den aggregate + left join referenced `base` three times,
    # re-running the scan + window chain thrice in one plan (guide
    # §2.4). All products take the identical decimal casts; the old
    # left-join NULL numerator becomes the empty conditional sum
    # (coalesce unchanged).
    probes = base.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(m))).alias("k"),
        (F.col("rn")).alias("rn0"),
        F.col("d").alias("dl"),
        "n",
    ).select(
        "key", "k", (F.col("rn0") + F.col("k")).alias("rn"), "dl", "n"
    )
    prod = (F.col("dl").cast("decimal(19,0)") * F.col("dr")).cast(
        "decimal(38,0)"
    )
    joined = (
        probes.join(base.select("key", "rn", F.col("d").alias("dr")), ["key", "rn"])
        .groupBy("key")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when(F.col("k") == 0, prod)).alias("dd"),
            F.sum(F.when(F.col("k") > 0, prod)).alias("nn"),
        )
        .filter(F.col("dd") > 0)
    )
    tau = F.lit(1.0) + F.lit(2.0) * (
        F.coalesce(F.col("nn"), F.lit(0)).cast("double") / F.col("dd").cast("double")
    )
    return joined.select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.floor(tau * 1e6).cast("long").alias("tau_u6"),
        F.when(tau > 0, F.floor(F.col("n") / tau * 1e6).cast("long")).alias("ess_u6"),
    )
