"""KPSS level-stationarity test per key on the hourly LOCF grid —
"is this series mean-reverting, or does it wander?"

The unit-root COMPLEMENT of the Engle-Granger ADF step
(operators/cointegration.py): ADF's null is "has a unit root", KPSS's
null is "is level-stationary" (Kwiatkowski-Phillips-Schmidt-Shin 1992,
public formula). Running both brackets the answer; on rolled-up tits
tiers it is the gate between "model the level" and "model the
differences". With demeaned residuals e_t = x_t - mean and partial
sums S_t = sum_{i<=t} e_i,

    eta = (1/n^2) * sum_t S_t^2 / s2_lrv

where s2_lrv is the Bartlett long-run variance with L lags:
gamma_0 + 2*sum_{j=1..L} (1 - j/(L+1)) * gamma_j,
gamma_j = (1/n) sum_t e_t e_{t-j}. Large eta rejects stationarity
(5% critical value 0.463 for the level case).

Alignment is tits-style: the series is the hourly last-in-bucket +
LOCF grid over the key's span (the single-sided use of
granger.locf_bucket_grid — identical dedup/bucket determinism rules),
so gaps do not fabricate spurious mean reversion.

Exactness: cents-quantized values; every accumulated quantity is an
INTEGER on the n-scaled residual lattice E_t = n*x_t - T (T = total,
so E_t = n*e_t exactly — no float mean anywhere). Cumulative sums
C_t = n*S_t are summed in decimal and the three moment families

    ss2 = sum C_t^2             (= n^4 * sum S_t^2)
    s2e = sum E_t^2             (= n^3 * gamma_0)
    g_j = sum E_t * E_{t-j}     (= n^3 * gamma_j)

accumulate in decimal(38,0), so no float partial-sum order exists
anywhere. The Bartlett weights are constant INTEGERS once the
denominator is cleared, so the eight lag sums FOLD into one decimal
sum of E_t * (16*E_{t-1} + 14*E_{t-2} + ... + 2*E_{t-8}) — measured
5.6 s -> 3 s at sf0.1 vs. eleven separate decimal aggregations (the
inner weighted combination stays int64: |.| <= 72*n*|c|max).
Bounds: |E| <= n*|c|max, |C| <= n^2*|c|max (int64 inside the
envelope below; ANSI mode fails LOUD past it, never wraps) and
ss2 <= n^5*|c|max^2 (< 10^38 for n <= ~10^5 buckets at 6-figure
cents) — beyond that, re-bucket to the next tits tier (daily), the
engine's standard retention discipline.
Clearing denominators with w_j = (L+1-j)/(L+1):

    eta = (L+1) * ss2 / ( n * [ (L+1)*s2e + 2*sum_j (L+1-j)*g_j ] )

Both engines convert the SAME exact decimal integers to double and
evaluate ONE identical expression tree. The integer sums exceed 2^53,
so the int->double conversions may differ by an ulp between engines
(measured: one key in 150 at sf0.01) — a relative 1e-16 wobble. The
ROUNDING QUANTA are therefore chosen per magnitude: eta is O(1) and
rounds at 6dp (quantum 1e-6 >> 1e-16); gamma0/s2_lrv are O(cents^2)
~1e8 where a 6dp quantum would demand 17 significant digits — more
than a double HAS — so they round at 2dp (quantum 1e-2 >> the ~3e-8
ulp wobble at that magnitude). The Bartlett weights make the
denominator a positive-semidefinite quadratic form, so it is never
negative; constant series (denominator 0) return NULL.

Plan shape (the 100 TB argument): ONE raw scan; the grid costs two
exchanges (granger.locf_bucket_grid), and every window below
(per-key total, cumulative sum, the L lags) plus the final groupBy
rides that same hashpartitioning(key) — no further exchange, no join,
no UDF. The L=8 lag columns are a fixed-width widening, not a fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid

DEC = "decimal(38,0)"
D19 = "decimal(19,0)"


def kpss_level(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    n_lags: int = 8,
    min_obs: int = 30,
) -> DataFrame:
    """Per-key KPSS level-stationarity statistic over the hourly LOCF
    grid. Returns (key, n_grid, gamma0, s2_lrv, eta): the grid length,
    the residual variance and Bartlett long-run variance in cents^2
    (round 6), and the KPSS statistic (round 6; NULL for constant
    series). Keys shorter than ``min_obs`` grid buckets are dropped
    (the Bartlett window needs n >> L; L is fixed, documented — an
    n-dependent L would put a double pow() in the contract).
    """
    ll = int(n_lags)
    if ll < 1:
        raise ValueError("kpss_level needs n_lags >= 1")
    mo = max(int(min_obs), 3 * (ll + 1))

    grid = locf_bucket_grid(
        df.withColumn("series", F.lit("x")),
        key=key, ts=ts, value=value, series="series",
        x_side="x", y_side="_none", bucket_secs=bucket_secs,
    ).select("key", "b", F.col("xc").alias("c"))

    wk = Window.partitionBy("key")
    wc = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("key").orderBy("b")

    e = grid.select(
        "key",
        "b",
        (F.count(F.lit(1)).over(wk) * F.col("c") - F.sum("c").over(wk))
        .alias("e"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    lp1 = ll + 1
    # fold the cleared-denominator Bartlett combination into ONE int64
    # column: null lags contribute 0 (exactly the per-j null-skip)
    wlag = F.lit(0).cast("long")
    for j in range(1, ll + 1):
        wlag = wlag + F.lit(2 * (lp1 - j)) * F.coalesce(
            F.lag("e", j).over(wo), F.lit(0)
        )
    cum = e.select(
        "key",
        "n",
        F.col("e"),
        F.sum("e").over(wc).alias("s"),
        wlag.alias("wl"),
    )

    agg = (
        cum.groupBy("key")
        .agg(
            F.max("n").alias("n_grid"),
            F.sum(F.col("s").cast(D19) * F.col("s")).alias("ss2"),
            F.sum(F.col("e").cast(D19) * F.col("e")).alias("s2e"),
            F.sum(F.col("e").cast(D19) * F.col("wl")).alias("gw"),
        )
        .filter(F.col("n_grid") >= mo)
    )

    den_dec = F.lit(lp1).cast(DEC) * F.col("s2e") + F.col("gw")
    n_d = F.col("n_grid").cast("double")
    den = den_dec.cast("double")
    n3 = n_d * n_d * n_d
    eta = F.when(
        den_dec > 0,
        F.round(
            F.lit(float(lp1)) * F.col("ss2").cast("double") / (n_d * den),
            6,
        ),
    )
    gamma0 = F.round(F.col("s2e").cast("double") / n3, 2)
    s2_lrv = F.when(
        den_dec > 0, F.round(den / (F.lit(float(lp1)) * n3), 2)
    )
    return agg.select(
        "key",
        F.col("n_grid").cast("long").alias("n_grid"),
        gamma0.alias("gamma0"),
        s2_lrv.alias("s2_lrv"),
        eta.alias("eta"),
    )


def lo_modified_rs(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    n_lags: int = 8,
    min_obs: int = 30,
) -> DataFrame:
    """Lo's modified rescaled-range statistic per key — LONG-range
    dependence, robust to the short-range autocorrelation that fools
    the classic Mandelbrot R/S (Lo, Econometrica 1991, public formula;
    the test-statistic partner of the hurst point estimate):

        V = (max_t S_t - min_t S_t) / (sqrt(n) * s_lrv)

    with the SAME Bartlett long-run variance as KPSS. On the n-scaled
    integer lattice the range R' = max S' - min S' is exact int64 and
    the whole statistic collapses to V = sqrt(L+1) * R' / sqrt(den)
    with den the cleared-denominator Bartlett quadratic form — for the
    fixed L=8 the factor is EXACTLY 3.0, so V is one fixed double tree
    over two exact integers. Null (no long memory) 95% band is
    [0.809, 1.862]. Returns (key, n_grid, r_range, v_stat); plan shape
    identical to kpss_level (one scan, two exchanges, no join/UDF).
    """
    ll = int(n_lags)
    if ll != 8:
        raise ValueError(
            "lo_modified_rs fixes L=8 so sqrt(L+1)=3.0 is exact in the "
            "cross-engine contract"
        )
    mo = max(int(min_obs), 3 * (ll + 1))

    grid = locf_bucket_grid(
        df.withColumn("series", F.lit("x")),
        key=key, ts=ts, value=value, series="series",
        x_side="x", y_side="_none", bucket_secs=bucket_secs,
    ).select("key", "b", F.col("xc").alias("c"))

    wk = Window.partitionBy("key")
    wc = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("key").orderBy("b")

    e = grid.select(
        "key",
        "b",
        (F.count(F.lit(1)).over(wk) * F.col("c") - F.sum("c").over(wk))
        .alias("e"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    lp1 = ll + 1
    wlag = F.lit(0).cast("long")
    for j in range(1, ll + 1):
        wlag = wlag + F.lit(2 * (lp1 - j)) * F.coalesce(
            F.lag("e", j).over(wo), F.lit(0)
        )
    cum = e.select(
        "key",
        "n",
        F.col("e"),
        F.sum("e").over(wc).alias("s"),
        wlag.alias("wl"),
    )
    agg = (
        cum.groupBy("key")
        .agg(
            F.max("n").alias("n_grid"),
            (F.max("s") - F.min("s")).alias("r_range"),
            F.sum(F.col("e").cast(D19) * F.col("e")).alias("s2e"),
            F.sum(F.col("e").cast(D19) * F.col("wl")).alias("gw"),
        )
        .filter(F.col("n_grid") >= mo)
    )
    den_dec = F.lit(lp1).cast(DEC) * F.col("s2e") + F.col("gw")
    v_stat = F.when(
        den_dec > 0,
        F.round(
            F.lit(3.0) * F.col("r_range").cast("double")
            / F.sqrt(den_dec.cast("double")),
            6,
        ),
    )
    return agg.select(
        "key",
        F.col("n_grid").cast("long").alias("n_grid"),
        "r_range",
        v_stat.alias("v_stat"),
    )
