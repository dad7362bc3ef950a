"""Normality and single-outlier screens per key: the Jarque-Bera
test on returns and the Grubbs extreme studentized deviate.

* ``jarque_bera`` (Jarque & Bera 1980, public formula): with S the
  skewness and K the EXCESS kurtosis of the cents returns,
  JB = n * (S^2/6 + K^2/24), chi-square(2) under normality (5%
  critical value 5.991465). The formal yes/no in front of everything
  that assumes Gaussian innovations (the Kalman filter's likelihood,
  Gaussian VaR, OLS t-tests) — cornish_fisher quantifies HOW the tail
  deviates; JB decides WHETHER it does.
* ``grubbs`` (Grubbs 1950, public formula): G = max |x - xbar| / s
  with the SAMPLE standard deviation. Because the maximum deviation
  is always attained at the min or max order statistic, G needs only
  (n, sum, sum^2, min, max) — one aggregate, no second pass. The
  offending side is reported via the exact integer comparison
  n*(cmax + cmin) >= 2*S1 (high side wins ties).

Exactness: cents with the house dup-timestamp rule. JB's four power
sums accumulate in decimal(38,0) (cornish_fisher's device: |r| <=
~3e4 keeps r^4 inside int64 per term); Grubbs' sums and the side
comparison are exact int64/decimal. Each statistic is ONE fixed
double expression over the exact integers, rounded at 6dp — the
conversions wobble at most an ulp, far inside the rounding quantum.
Constant keys (zero variance) return NULL statistics.

Plan shape (the 100 TB argument): jarque_bera is the cornish_fisher
plan (dedup aggregate, one lag, one groupBy on ONE
hashpartitioning(key) exchange); grubbs has no window at all — dedup
aggregate then groupBy, same single exchange. No join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

D19 = "decimal(19,0)"


def _ticks(df: DataFrame, key: str, ts: str, value: str) -> DataFrame:
    return (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )


def jarque_bera(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 30,
) -> DataFrame:
    """Per-key Jarque-Bera normality test on cents returns.

    Returns (key, n_ret, skew, kurt_x, jb): skewness, excess
    kurtosis and the JB statistic rounded to 6dp (NULL for constant
    keys). Keys with fewer than ``min_returns`` returns drop out.
    """
    mo = max(int(min_returns), 8)
    wo = Window.partitionBy("key").orderBy("us")
    r = (
        _ticks(df, key, ts, value)
        .select("key", (F.col("c") - F.lag("c").over(wo)).alias("r"))
        .filter(F.col("r").isNotNull())
    )
    agg = (
        r.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("r").cast(D19)).alias("s1"),
            F.sum(F.col("r").cast(D19) * F.col("r")).alias("s2"),
            F.sum((F.col("r") * F.col("r")).cast(D19) * F.col("r")).alias("s3"),
            F.sum(
                (F.col("r") * F.col("r")).cast(D19) * (F.col("r") * F.col("r"))
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
    jb = n * (skew * skew / 6.0 + kurt * kurt / 24.0)
    ok = F.col("s2") * F.col("n") > F.col("s1") * F.col("s1")
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_ret"),
        F.round(F.when(ok, skew), 6).alias("skew"),
        F.round(F.when(ok, kurt), 6).alias("kurt_x"),
        F.round(F.when(ok, jb), 6).alias("jb"),
    )


def grubbs(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key Grubbs extreme studentized deviate on cents levels.

    Returns (key, n_obs, g, side): the G statistic rounded to 6dp
    (NULL for constant keys) and which extreme attains it ('high' /
    'low', high on exact ties). Keys shorter than ``min_obs`` drop.
    """
    mo = max(int(min_obs), 3)
    agg = (
        _ticks(df, key, ts, value)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c").cast(D19)).alias("s1"),
            F.sum(F.col("c").cast(D19) * F.col("c")).alias("s2"),
            F.min("c").alias("cmin"),
            F.max("c").alias("cmax"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    mu = s1 / n
    # sample variance via the cleared form n*S2 - S1^2 (exact decimal)
    v_dec = F.col("n").cast("decimal(38,0)") * F.col("s2") - F.col(
        "s1"
    ) * F.col("s1")
    s = F.sqrt(v_dec.cast("double") / (n * (n - 1.0)))
    dev_hi = F.col("cmax").cast("double") - mu
    dev_lo = mu - F.col("cmin").cast("double")
    high = (
        F.col("n").cast(D19) * (F.col("cmax") + F.col("cmin"))
        >= F.lit(2).cast(D19) * F.col("s1")
    )
    g = F.when(v_dec > 0, F.when(high, dev_hi).otherwise(dev_lo) / s)
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        F.round(g, 6).alias("g"),
        F.when(high, F.lit("high")).otherwise(F.lit("low")).alias("side"),
    )


def _phi(z):
    """Standard normal CDF via the Abramowitz & Stegun 7.1.26 erf
    polynomial (max abs error 1.5e-7 — public formula), evaluated as
    the IDENTICAL Horner tree on both engines so cross-engine values
    are bit-equal, not merely close:

        t = 1/(1 + 0.3275911 x),  x = |z|/sqrt(2)
        erf(x) ~ 1 - (((((a5 t + a4) t + a3) t + a2) t + a1) t) e^{-x^2}
        Phi(z) = 0.5 (1 + sign(z) erf(|z|/sqrt(2)))
    """
    x = F.abs(z) / F.lit(1.4142135623730951)  # sqrt(2), shortest repr
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        (
            (
                (
                    F.lit(1.061405429) * t + F.lit(-1.453152027)
                ) * t
                + F.lit(1.421413741)
            ) * t
            + F.lit(-0.284496736)
        ) * t
        + F.lit(0.254829592)
    ) * t
    erf = F.lit(1.0) - poly * F.exp(-(x * x))
    sgn = F.when(z < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.lit(0.5) * (F.lit(1.0) + sgn * erf)


#: the same polynomial as a DuckDB SQL fragment (z must be a column
#: expression; keep the op tree in exact sync with _phi above)
PHI_SQL = """
0.5 * (1.0 + (CASE WHEN {z} < 0 THEN -1.0 ELSE 1.0 END) * (1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951))) + -1.453152027) * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951))) + 1.421413741) * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951))) + -0.284496736) * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951))) + 0.254829592) * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)))) * exp(-((abs({z}) / 1.4142135623730951) * (abs({z}) / 1.4142135623730951)))))
"""


def lilliefors(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    min_n: int = 20,
) -> DataFrame:
    """Lilliefors (1967) KS test of normality with estimated mean and
    variance, per key — the EDF companion of jarque_bera (which tests
    MOMENTS; this tests the whole CDF shape and reacts to any
    departure, not just skew/kurtosis).

    On the per-key cents tie grid with cumulative upper position b
    and lower position a = b - t:

        D+ = max over cells (b/n - Phi(z)),  D- = max (Phi(z) - a/n)
        D  = max(D+, D-)

    with z = (c - mean)/s from exact integer (n, S1, S2) sums and
    Phi the shared A&S 7.1.26 tree (:func:`_phi`) — every compared
    quantity is an identical double on both engines, so the maxima
    are exact decisions, not approximations.  Also emits Stephens'
    (1974) modified statistic d_mod = D (sqrt(n) - 0.01 +
    0.85/sqrt(n)) whose 5%/1% points are 0.895/1.035.  Outputs round
    6, signed zero normalized; a zero-variance key emits NULL.

    Plan: the tie-grid family shape — hash agg to (key, cents) cells
    -> ONE (key)-window cumulative chain -> per-key agg on the same
    exchange.  No joins, no Python.

    Returns (key, n, d_plus, d_minus, d_stat, d_mod)."""
    cents = F.round(F.col(value) * 100).cast("long")
    grid = (
        df.select(F.col(key).alias("key"), cents.alias("c"))
        .groupBy("key", "c")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("key")
    cum = grid.select(
        "key",
        "c",
        "t",
        F.sum("t").over(wcum).alias("b"),
        F.sum("t").over(wall).alias("n"),
        F.sum(F.col("t") * F.col("c")).over(wall).alias("s1"),
        F.sum(F.col("t") * F.col("c") * F.col("c")).over(wall).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (n * (n - F.lit(1.0)))
    s = F.sqrt(var)
    z = (F.col("c").cast("double") - mean) / s
    ph = _phi(z)
    dplus = F.col("b").cast("double") / n - ph
    dminus = ph - (F.col("b") - F.col("t")).cast("double") / n
    agg = (
        cum.groupBy("key")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(F.when(var > 0, dplus)).alias("_dp"),
            F.max(F.when(var > 0, dminus)).alias("_dm"),
        )
        .filter(F.col("n") >= int(min_n))
    )
    d = F.greatest(F.col("_dp"), F.col("_dm"))
    rn = F.sqrt(F.col("n").cast("double"))
    dmod = d * (rn - F.lit(0.01) + F.lit(0.85) / rn)
    return agg.select(
        "key",
        "n",
        (F.round(F.col("_dp"), 6) + F.lit(0.0)).alias("d_plus"),
        (F.round(F.col("_dm"), 6) + F.lit(0.0)).alias("d_minus"),
        (F.round(d, 6) + F.lit(0.0)).alias("d_stat"),
        (F.round(dmod, 6) + F.lit(0.0)).alias("d_mod"),
    )


#: Acklam (2003) inverse-normal coefficients — public domain algorithm,
#: relative error < 1.15e-9; evaluated as identical Horner trees on
#: both engines (the PHI_SQL discipline)
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _probit(p):
    """Inverse standard normal CDF (Acklam's rational approximation)
    as a Spark Column tree; p must lie in (0, 1).  The exact same
    op tree is generated for DuckDB by :func:`probit_sql`."""
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D

    def center(q):
        r = q * q
        num = (
            (
                (
                    ((F.lit(a[0]) * r + F.lit(a[1])) * r + F.lit(a[2])) * r
                    + F.lit(a[3])
                ) * r
                + F.lit(a[4])
            ) * r
            + F.lit(a[5])
        ) * q
        den = (
            (
                ((F.lit(b[0]) * r + F.lit(b[1])) * r + F.lit(b[2])) * r
                + F.lit(b[3])
            ) * r
            + F.lit(b[4])
        ) * r + F.lit(1.0)
        return num / den

    def tail(q):
        num = (
            (
                (
                    ((F.lit(c[0]) * q + F.lit(c[1])) * q + F.lit(c[2])) * q
                    + F.lit(c[3])
                ) * q
                + F.lit(c[4])
            ) * q
            + F.lit(c[5])
        )
        den = (
            ((F.lit(d[0]) * q + F.lit(d[1])) * q + F.lit(d[2])) * q
            + F.lit(d[3])
        ) * q + F.lit(1.0)
        return num / den

    lo = tail(F.sqrt(F.lit(-2.0) * F.log(p)))
    hi = -tail(F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p)))
    return (
        F.when(p < F.lit(_ACK_PLOW), lo)
        .when(p > F.lit(1.0 - _ACK_PLOW), hi)
        .otherwise(center(p - F.lit(0.5)))
    )


def probit_sql(p: str) -> str:
    """The identical Acklam tree as a DuckDB SQL fragment; ``p`` is a
    column expression string (must be in (0, 1)).  Every constant is
    emitted as CAST('<shortest-repr>' AS DOUBLE) — DuckDB parses bare
    decimal literals as DECIMAL and overflows the scale in the Horner
    products (the watson_u2 lesson)."""
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D

    def k(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    q = f"({p} - 0.5)"
    r = f"({q} * {q})"
    num_c = (
        f"((((({k(a[0])} * {r} + {k(a[1])}) * {r} + {k(a[2])}) * {r}"
        f" + {k(a[3])}) * {r} + {k(a[4])}) * {r} + {k(a[5])}) * {q}"
    )
    den_c = (
        f"(((({k(b[0])} * {r} + {k(b[1])}) * {r} + {k(b[2])}) * {r}"
        f" + {k(b[3])}) * {r} + {k(b[4])}) * {r} + 1.0"
    )
    center = f"(({num_c}) / ({den_c}))"

    def tail(qe: str) -> str:
        num = (
            f"((((({k(c[0])} * {qe} + {k(c[1])}) * {qe} + {k(c[2])}) * {qe}"
            f" + {k(c[3])}) * {qe} + {k(c[4])}) * {qe} + {k(c[5])})"
        )
        den = (
            f"((({k(d[0])} * {qe} + {k(d[1])}) * {qe} + {k(d[2])}) * {qe}"
            f" + {k(d[3])}) * {qe} + 1.0"
        )
        return f"(({num}) / ({den}))"

    qlo = f"sqrt(-2.0 * ln({p}))"
    qhi = f"sqrt(-2.0 * ln(1.0 - {p}))"
    return (
        f"(CASE WHEN {p} < {k(_ACK_PLOW)} THEN {tail(qlo)} "
        f"WHEN {p} > {k(1.0 - _ACK_PLOW)} THEN -{tail(qhi)} "
        f"ELSE {center} END)"
    )
