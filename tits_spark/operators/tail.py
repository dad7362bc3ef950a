"""Heavy-tail diagnostics: the Hill tail-index estimator per key.

Hill (Annals of Statistics 1975, public formula): with the k largest
positive observations x_(1) >= ... >= x_(k) and the threshold
x_(k+1),

    H_k   = (1/k) * sum_i ln(x_(i)) - ln(x_(k+1))
    alpha = 1 / H_k

alpha estimates the Pareto tail exponent — the standard check that a
value distribution (latencies, token counts, transfer sizes) is
heavy-tailed and HOW heavy, which decides whether mean-based capacity
math is even valid. alpha <= 2 means infinite variance; alpha <= 1,
infinite mean.

Plan shape: one window shuffle per key (rank by value desc — the same
per-group top-k shape as stratified sampling), the k+1 frame filter
prunes everything else BEFORE the aggregate, so the agg input is
(k+1) x n_keys rows regardless of input size. Ties at the k+1
boundary are broken by (ts, value) row order — any choice among equal
values yields the same ln, so the statistic is tie-stable by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def hill_tail(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    k: int = 50,
) -> DataFrame:
    """Per-key Hill estimator over the k largest positive values.
    Returns (key, n_pos, hill, alpha) rounded to 6dp; keys with fewer
    than k+1 positive observations drop out (the threshold order
    statistic doesn't exist). Degenerate tails (all top values equal,
    H = 0) return NULL alpha rather than +inf."""
    kk = int(k)
    pos = df.filter(F.col(value) > 0)
    w = Window.partitionBy(key).orderBy(F.desc(value), F.asc(ts))
    ranked = pos.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= kk + 1
    )
    counts = pos.groupBy(key).agg(F.count(F.lit(1)).alias("n_pos"))
    agg = (
        ranked.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.sum(F.when(F.col("_r") <= kk, F.log(value))).alias("_s"),
            F.max(F.when(F.col("_r") == kk + 1, F.col(value))).alias("_xk1"),
        )
        .filter(F.col("_m") == kk + 1)
    )
    h = F.col("_s") / kk - F.log("_xk1")
    return (
        agg.join(counts, key)
        .select(
            F.col(key).alias("key"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(h, 6).alias("hill"),
            F.round(
                F.when(h > 0, F.lit(1.0) / h), 6
            ).alias("alpha"),
        )
    )


def gpd_pot(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    k: int = 50,
) -> DataFrame:
    """Peaks-over-threshold GPD fit per key via probability-weighted
    moments (Hosking & Wallis, Technometrics 1987, public formula).

    The threshold u is the (k+1)-th largest value on the cents
    lattice (a copied order statistic — exact, cross-engine
    bit-identical), the exceedances y_(1) <= ... <= y_(k) are the k
    largest values minus u (exact nonnegative integer cents), and
    with the two exact rank-weighted sums

        M0 = sum_j y_(j)                    (decimal(38,0))
        M1 = sum_j (k - j) * y_(j)          (decimal(38,0))
        D  = (k - 1) * M0 - 2 * M1          (exact; > 0 required)

    the PWM estimators of the GPD(xi, sigma) of the excess
    distribution are

        xi    = 2 - (k - 1) * M0 / D        (shape; > 0 heavy tail,
                                             ~ 1/alpha_hill)
        sigma = 2 * M0 * M1 / (k * D)       (scale, in cents)

    — each ONE fixed double expression over exact integers, mirrored
    verbatim in the DuckDB oracle, round-6 with signed zero
    normalized. M1's ascending rank j is derived from the SAME
    descending row_number used for the top-k membership (j = k+1-r),
    so no second sort exists; within a block of tied y the sum of
    (k-j)*y depends only on the block's rank span, making both sums
    tie-invariant (the energy/gini rank-weight argument). Degenerate
    tails (all exceedances equal => D = 0, checked EXACTLY on the
    decimal lattice, never on a rounded double) return NULL xi/sigma.

    This completes the EVT triptych: hill_tail says HOW heavy,
    extremal_index says how CLUSTERED, gpd_pot gives the actual
    excess-law parameters that turn a threshold into a return-level
    forecast.

    Plan shape: identical to hill_tail/extremal_index — one window
    shuffle per key whose rank filter prunes to k+1 rows per key
    before the aggregate (Spark plans a map-side WindowGroupLimit
    below the exchange), and the final groupBy(key) reuses the
    window's hashpartitioning — one exchange total, no joins.

    Returns (key, n_exc, u_cents, m0, m1, xi, sigma_c).
    """
    kk = int(k)
    if kk < 3:
        raise ValueError("gpd_pot needs k >= 3 for a two-moment fit")
    cents = F.round(F.col(value) * 100).cast("long")
    rows = df.select(
        F.col(key).alias("key"), epoch_us(ts).alias("us"), cents.alias("c")
    )
    w = Window.partitionBy("key").orderBy(F.desc("c"), F.asc("us"))
    top = rows.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= kk + 1
    )
    u = F.max(F.when(F.col("_r") == kk + 1, F.col("c")))
    agg = (
        top.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            u.alias("u_cents"),
            F.sum(
                F.when(F.col("_r") <= kk, F.col("c").cast("decimal(38,0)"))
            ).alias("_sc"),
            # ascending rank j = kk + 1 - _r, so (k - j) = _r - 1
            F.sum(
                F.when(
                    F.col("_r") <= kk,
                    (
                        (F.col("_r") - 1).cast("decimal(19,0)") * F.col("c")
                    ).cast("decimal(38,0)"),
                )
            ).alias("_swc"),
        )
        .filter(F.col("_m") == kk + 1)
    )
    # exceedance sums: y = c - u, so M0 = _sc - k*u and
    # M1 = sum (_r - 1) * (c - u) = _swc - u * k(k-1)/2
    m0 = (
        F.col("_sc") - F.lit(kk) * F.col("u_cents").cast("decimal(38,0)")
    ).alias("m0")
    m1 = (
        F.col("_swc")
        - F.lit(kk * (kk - 1) // 2) * F.col("u_cents").cast("decimal(38,0)")
    ).alias("m1")
    withm = agg.select("key", "u_cents", m0, m1)
    d = F.lit(kk - 1) * F.col("m0") - F.lit(2) * F.col("m1")
    xi = F.when(
        d > 0,
        F.round(
            F.lit(2.0)
            - F.lit(float(kk - 1))
            * F.col("m0").cast("double")
            / d.cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    sigma = F.when(
        d > 0,
        F.round(
            F.lit(2.0)
            * F.col("m0").cast("double")
            * F.col("m1").cast("double")
            / (F.lit(float(kk)) * d.cast("double")),
            6,
        )
        + F.lit(0.0),
    )
    # m0 <= k*max_cents and m1 <= k^2*max_cents: exact as BIGINT for
    # any real k; the internal accumulation is decimal(38,0) regardless
    return withm.select(
        "key",
        F.lit(kk).cast("long").alias("n_exc"),
        "u_cents",
        F.col("m0").cast("long").alias("m0"),
        F.col("m1").cast("long").alias("m1"),
        xi.alias("xi"),
        sigma.alias("sigma_c"),
    )


def cornish_fisher(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 30,
) -> DataFrame:
    """Cornish-Fisher modified VaR per key — the parametric tail
    estimate that prices in the skew and kurtosis a Gaussian VaR
    ignores (Cornish & Fisher 1938; the Zangari/"modified VaR"
    practitioner form, public formula). The parametric COUNTERPART of
    var_backtest's historical quantile and gpd_pot's asymptotic fit:
    with S = skewness, K = excess kurtosis of the returns and z the
    1% normal quantile,

        z_cf = z + (z^2-1)S/6 + (z^3-3z)K/24 - (2z^3-5z)S^2/36
        mVaR = -(mu + sigma * z_cf)

    Exactness: cents returns under the house dup-timestamp rule; the
    four power sums S1..S4 accumulate exactly in decimal(38,0)
    (moments.py's device over RETURNS; |r| <= ~3e4 keeps r^4 in
    int64). mu/sigma/S/K/z_cf/mVaR are ONE fixed double tree over
    (n, S1..S4) with z embedded as the identical repr literal
    -2.3263478740408408 on both engines; outputs round at 6dp (all
    O(1)..O(1e4) magnitudes, far above the 2^53-conversion ulp).
    Constant keys (sigma = 0) return NULL tail fields.

    Plan shape (the 100 TB argument): dedup aggregate, one window lag,
    one groupBy — ONE hashpartitioning(key) exchange, no join, no UDF.
    """
    mo = max(int(min_returns), 8)
    z = -2.3263478740408408  # Phi^{-1}(0.01), repr-exact both engines
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    wo = Window.partitionBy("key").orderBy("us")
    r = ticks.select(
        "key", (F.col("c") - F.lag("c").over(wo)).alias("r")
    ).filter(F.col("r").isNotNull())
    d19 = "decimal(19,0)"
    agg = (
        r.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("r").cast(d19)).alias("s1"),
            F.sum(F.col("r").cast(d19) * F.col("r")).alias("s2"),
            F.sum(
                (F.col("r") * F.col("r")).cast(d19) * F.col("r")
            ).alias("s3"),
            F.sum(
                (F.col("r") * F.col("r")).cast(d19)
                * (F.col("r") * F.col("r"))
            ).alias("s4"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * s2 / n + 2.0 * mu * mu * mu
    m4 = (
        s4 / n
        - 4.0 * mu * s3 / n
        + 6.0 * mu * mu * s2 / n
        - 3.0 * mu * mu * mu * mu
    )
    sig = F.sqrt(m2)
    skew = m3 / (sig * sig * sig)
    kurt = m4 / (m2 * m2) - 3.0
    zl = F.lit(z)
    zcf = (
        zl
        + (zl * zl - 1.0) * skew / 6.0
        + (zl * zl * zl - 3.0 * zl) * kurt / 24.0
        - (2.0 * zl * zl * zl - 5.0 * zl) * skew * skew / 36.0
    )
    ok = F.col("s2") * F.col("n") > F.col("s1") * F.col("s1")
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_ret"),
        F.round(F.when(ok, skew), 6).alias("skew"),
        F.round(F.when(ok, kurt), 6).alias("kurt_x"),
        F.round(F.when(ok, zcf), 6).alias("z_cf"),
        F.round(F.when(ok, -(mu + sig * zcf)), 6).alias("mvar_cents"),
    )
