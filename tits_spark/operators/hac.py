"""Newey-West (HAC) trend inference per key on the hourly LOCF grid —
"is the drift real once autocorrelation is priced in?"

`linreg.ols_trend` fits the slope; its naive t-statistic assumes iid
residuals, which rolled-up tits series violate grossly (LOCF alone
manufactures serial correlation). This operator re-tests the SAME
slope under the Newey-West heteroskedasticity-and-autocorrelation-
consistent variance (Newey & West 1987, public formula) with the
Bartlett kernel at the house-fixed L = 8 — the inference partner of
kpss_level, which it shares its entire lag machinery with.

With the regular design t = 1..n (the grid index), cents values c_t,
and cleared integer sufficient statistics

    Tt  = n(n+1)/2             St2 = sum t^2        Tc = sum c
    Sxx = n*St2 - Tt^2         Sxy = n*sum(t*c) - Tt*Tc

the OLS slope is EXACTLY Sxy/Sxx (cents per bucket). The cleared
residual lattice

    R_t = Sxx*(n*c_t - Tc) - Sxy*(n*t - Tt)     ( = n^2 * Sxx * e_t )

is an exact decimal(38,0) integer; the residual is then QUANTIZED to
whole cents, eq_t = floor(R_t / (n*Sxx)), so the statistic is DEFINED
on a deterministic integer lattice (the mutual_info/allan
quantize-then-sum discipline — a 1-cent residual grain is far inside
any practical confidence band). The floor runs over the two engines'
identical decimal->double conversions; above 2^53 those conversions
can differ by one ulp (kpss.py's measured 1-in-150-keys wobble), which
at worst moves ONE eq by +-1 — a relative ~1e-10 nudge six orders
below the round-6 emission quantum. With v_t = x~_t * e_t the NW
variance needs the weighted autocovariances of h_t = (n*t - Tt)*eq_t
(= n * x~_t * eq_t); the n^2 scale factors cancel against Sxx^2:

    S_lrv = (L+1)*sum h^2 + sum_t h_t * sum_j 2*(L+1-j)*h_{t-j}
    se(b) = sqrt(S_lrv/(L+1)) / Sxx
    t_nw  = Sxy * sqrt((L+1)/S_lrv)

— every accumulation decimal(38,0) (the same single-fold Bartlett
combination as kpss, PSD so never negative), one double tree at the
end. Envelope: h_t <= n^2 * |eq|max keeps the gw sum inside
decimal(38,0) for n <= ~5e4 grid buckets per key at 8-figure-cent
residuals (~5.7 years hourly); past that, re-bucket to the daily tier
— the engine's standard retention discipline.

Plan shape: identical to kpss_level — ONE raw scan, the grid's two
exchanges, then every window (per-key sums, row_number, the L=8 lag
fold) and the final groupBy ride the same hashpartitioning(key). No
join, no UDF, no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid

DEC = "decimal(38,0)"
D19 = "decimal(19,0)"


def newey_west_trend(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    n_lags: int = 8,
    min_obs: int = 30,
) -> DataFrame:
    """Per-key OLS time-trend with Newey-West (Bartlett, L=8) robust
    inference over the hourly LOCF grid.

    Returns (key, n_grid, slope, se_nw, t_nw): the exact-ratio slope
    in value units per bucket and the HAC standard error / t-statistic
    (all round 6; se/t NULL when the long-run variance is 0 — a
    residual series flat at the cent grain). Keys shorter than
    ``min_obs`` buckets drop."""
    ll = int(n_lags)
    if ll < 1:
        raise ValueError("newey_west_trend needs n_lags >= 1")
    mo = max(int(min_obs), 3 * (ll + 1))

    grid = locf_bucket_grid(
        df.withColumn("series", F.lit("x")),
        key=key, ts=ts, value=value, series="series",
        x_side="x", y_side="_none", bucket_secs=bucket_secs,
    ).select("key", "b", F.col("xc").alias("c"))

    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("b")

    t = F.row_number().over(wo)
    # Per-key sufficient statistics as LONG window sums (round-6 perf:
    # the original kept every intermediate in decimal(38,0), which puts
    # BigDecimal arithmetic on every row of the grid inside the
    # non-codegen WindowExec — measured 2.4x slower end to end. Int64
    # bounds (eqmax = max|eq| cents, cmax = max|c| cents):
    #   stc = sum t*c  <= cmax*n^2/2
    #   st2 = sum t^2  <= n^3/3        (safe for n <= 3e6)
    #   sxx = n*st2 - Tt^2 <= n^4/12   (safe for n <= 1.0e5)
    #   h   = (n*t - Tt)*eq <= (n^2/2)*eqmax
    #   wl  = Bartlett fold <= 72*h_max = 36*n^2*eqmax
    # so the binding constraint is 36*n^2*eqmax <= 9.2e18 — n = 5e4
    # hourly buckets (5.7 years) at 8-figure-cent residuals sits right
    # at it. Because int64 wrap is SILENT, the emission is gated by a
    # runtime raise_error computed from wrap-safe quantities (n, max
    # |c|, max|eq| — the mood_changepoint enforcement precedent): past
    # the bound the job fails loudly telling the user to re-bucket to
    # the daily tier, exactly what the old decimal envelope docs
    # prescribed. Integer arithmetic is exact in both representations,
    # so g0/gw and every emitted double are bit-identical to the
    # decimal formulation (oracle SQL unchanged). Only sxy
    # (<= n^3*cmax/2, past int64), r, and the g0/gw products stay
    # decimal.
    base = grid.select(
        "key",
        "b",
        "c",
        t.alias("t"),
        F.count(F.lit(1)).over(wk).alias("n"),
        F.sum("c").over(wk).alias("tc"),
    ).withColumns({
        "stc": F.sum(F.col("t") * F.col("c")).over(wk),
        "st2": F.sum(F.col("t") * F.col("t")).over(wk),
    })
    n_dec = F.col("n").cast(DEC)
    tt_l = (F.col("n") * (F.col("n") + 1) / 2).cast("long")  # exact: even product
    sxx_l = (F.col("n") * F.col("st2") - F.col("_tt") * F.col("_tt")).alias("sxx")
    sxy = (
        n_dec * F.col("stc").cast(DEC)
        - F.col("_tt").cast(DEC) * F.col("tc").cast(DEC)
    ).alias("sxy")
    r = (
        F.col("sxx").cast(DEC) * (n_dec * F.col("c") - F.col("tc").cast(DEC))
        - F.col("sxy") * (n_dec * F.col("t") - F.col("_tt").cast(DEC))
    )
    rows = (
        base.withColumn("_tt", tt_l)
        .withColumn("sxx", sxx_l)
        .withColumn("sxy", sxy)
        .withColumn(
            "eq",
            F.floor(
                r.cast("double") / (n_dec * F.col("sxx").cast(DEC)).cast("double")
            ).cast("long"),
        )
        .withColumn(
            "h",
            (F.col("n") * F.col("t") - F.col("_tt")) * F.col("eq"),
        )
    )
    lp1 = ll + 1
    wlag = F.lit(0).cast("long")
    for j in range(1, ll + 1):
        wlag = wlag + F.lit(2 * (lp1 - j)) * F.coalesce(
            F.lag("h", j).over(wo), F.lit(0).cast("long")
        )
    cum = rows.withColumn("wl", wlag)
    agg = (
        cum.groupBy("key")
        .agg(
            F.max("n").alias("n_grid"),
            F.max("sxx").cast(DEC).alias("sxx"),
            F.max("sxy").alias("sxy"),
            F.sum(F.col("h").cast(DEC) * F.col("h").cast(DEC)).alias("g0"),
            F.sum(F.col("h").cast(DEC) * F.col("wl").cast(DEC)).alias("gw"),
            F.max(F.abs("eq")).alias("_eqmax"),
            F.max(F.abs("c")).alias("_cmax"),
        )
        .filter(F.col("n_grid") >= mo)
    )
    # enforced int64 envelope (wrap is silent, so gate on wrap-safe
    # n/cmax/eqmax in decimal): binding terms are the Bartlett fold
    # (36*n^2*eqmax), stc (n^2*cmax/2) and sxx (n^4/12)
    n2 = F.col("n_grid").cast(DEC) * F.col("n_grid").cast(DEC)
    overflow = (
        (n2 * F.col("_eqmax").cast(DEC) * F.lit(36).cast(DEC)
         > F.lit("9000000000000000000").cast(DEC))
        | (n2 * F.col("_cmax").cast(DEC)
           > F.lit("18000000000000000000").cast(DEC))
        | (F.col("n_grid") > F.lit(100000))
    )
    agg = agg.withColumn(
        "n_grid",
        F.when(
            overflow,
            F.raise_error(
                "newey_west_trend: int64 envelope exceeded (n_grid^2 * "
                "max residual cents too large) — re-bucket to a coarser "
                "tier (daily) before the trend test"
            ).cast("long"),
        ).otherwise(F.col("n_grid")),
    )
    s_lrv = (F.lit(lp1).cast(DEC) * F.col("g0") + F.col("gw")).alias("slrv")
    out = agg.withColumn("slrv", s_lrv)
    slope = F.col("sxy").cast("double") / F.col("sxx").cast("double")
    se = (
        F.sqrt(F.col("slrv").cast("double") / F.lit(float(lp1)))
        / F.col("sxx").cast("double")
    )
    tstat = F.col("sxy").cast("double") * F.sqrt(
        F.lit(float(lp1)) / F.col("slrv").cast("double")
    )
    pos = F.col("slrv") > 0
    return out.select(
        "key",
        F.col("n_grid").cast("long").alias("n_grid"),
        (F.round(slope / 100.0, 6) + F.lit(0.0)).alias("slope"),
        F.when(pos, F.round(se / 100.0, 6) + F.lit(0.0)).alias("se_nw"),
        F.when(pos, F.round(tstat, 6) + F.lit(0.0)).alias("t_nw"),
    )
