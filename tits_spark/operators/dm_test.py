"""Diebold-Mariano (1995) equal-predictive-accuracy test per key —
does the seasonal-naive forecast (value 24 hourly buckets ago) beat
the naive one (previous bucket) on this series, beyond luck?

The model-selection companion of naive_backtest (which only REPORTS
the two error sums) and hac_trend (whose Bartlett long-run-variance
machinery it reuses verbatim): DM standardizes the mean loss
differential by its HAC variance, because forecast-error differences
are serially correlated by construction.

Protocol on the hourly LOCF grid (granger.locf_bucket_grid, the
shared spine of kpss/hac/coint): with cents c_t at grid index t,

    lA_t = (c_t - c_{t-1})^2      naive squared loss
    lB_t = (c_t - c_{t-24})^2     seasonal-naive squared loss
    d_t  = lA_t - lB_t            defined for t >= 25 (n_eff of them)

All exact int64. The cleared-mean lattice e_t = n_eff * d_t - D
(D = sum d) is exact DECIMAL(38,0); the Bartlett(L=8) long-run sum is
the kpss/hac single fold

    S = (L+1) * sum e^2 + sum_t e_t * sum_{j=1..L} 2*(L+1-j)*e_{t-j}

and the statistic collapses (the n^3 scale factors cancel) to

    DM = D * n_eff * sqrt((L+1) / S)        ~ N(0,1) under H0,

one double tree over exact integers, round 6, NULL when S <= 0 (a
loss-differential series flat at the cent grain). Positive DM: the
seasonal-naive forecast wins (its loss is smaller).

Envelope: e_t <= n_eff * max|d|, so sum e^2 <= n^3 * max|d|^2 stays
inside decimal(38,0) for ~1e5 grid buckets at 1e6-cent hourly moves
(1e15 + 12 + 12 = 39... at 1e3-cent realistic moves it is ~1e27);
past that, re-bucket to the daily tier — the engine's standard
retention discipline (hac.py's envelope note).

Plan shape: identical to hac_trend — ONE raw scan, the grid's two
exchanges, then the lag windows and final groupBy ride the same
hashpartitioning(key). No join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid

DEC = "decimal(38,0)"
D19 = "decimal(19,0)"


def diebold_mariano(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    season: int = 24,
    n_lags: int = 8,
    min_obs: int = 60,
) -> DataFrame:
    """Per-key DM test of naive vs seasonal-naive hourly forecasts.

    Returns (key, n_eff, sum_la, sum_lb, sum_d, dm): the exact loss
    sums (cents^2), their differential, and the HAC-standardized DM
    score (round 6; NULL when the long-run variance is zero). Keys
    with fewer than ``min_obs`` comparable buckets drop.
    """
    ll = int(n_lags)
    sea = int(season)
    if ll < 1 or sea < 2:
        raise ValueError("diebold_mariano needs n_lags >= 1, season >= 2")
    mo = max(int(min_obs), 3 * (ll + 1))

    grid = locf_bucket_grid(
        df.withColumn("series", F.lit("x")),
        key=key, ts=ts, value=value, series="series",
        x_side="x", y_side="_none", bucket_secs=bucket_secs,
    ).select("key", "b", F.col("xc").alias("c"))

    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("b")
    da = F.col("c") - F.lag("c", 1).over(wo)
    db = F.col("c") - F.lag("c", sea).over(wo)
    losses = grid.select(
        "key",
        "b",
        (da * da).alias("la"),
        (db * db).alias("lb"),
    ).withColumn(
        "d",
        F.when(
            F.col("la").isNotNull() & F.col("lb").isNotNull(),
            F.col("la") - F.col("lb"),
        ),
    )
    base = losses.select(
        "key",
        "b",
        "la",
        "lb",
        "d",
        F.count("d").over(wk).alias("n_eff"),
        F.sum("d").over(wk).alias("dd"),
    ).filter(F.col("n_eff") >= mo)
    e = F.when(
        F.col("d").isNotNull(),
        (F.col("n_eff").cast(D19) * F.col("d") - F.col("dd")).cast(DEC),
    )
    rows = base.withColumn("e", e)
    lp1 = ll + 1
    # Bartlett fold over the LONG loss differential d (round-6 perf:
    # folding the decimal e = n*d - dd put 8 BigDecimal multiplies on
    # every grid row inside the non-codegen WindowExec; e is linear in
    # d, so wl = n*wd - dd*wn with wd = sum_j w_j d_{t-j} and wn =
    # sum_j w_j 1{d_{t-j} defined} — two int64 folds and two decimal
    # multiplies per row, exactly equal in value. int64 bound:
    # wd <= 72*|d|max = 288*cmax^2, safe through 8-figure cents;
    # enforced by the raise_error gate below (mood_changepoint
    # precedent) because int64 wrap is silent.
    wd = F.lit(0).cast("long")
    wn = F.lit(0).cast("long")
    for j in range(1, ll + 1):
        wd = wd + F.lit(2 * (lp1 - j)) * F.coalesce(
            F.lag("d", j).over(wo), F.lit(0).cast("long")
        )
        wn = wn + F.when(
            F.lag("d", j).over(wo).isNotNull(), F.lit(2 * (lp1 - j))
        ).otherwise(F.lit(0)).cast("long")
    cum = rows.withColumn("wd", wd).withColumn("wn", wn).withColumn(
        "wl",
        F.col("n_eff").cast(DEC) * F.col("wd").cast(DEC)
        - F.col("dd").cast(DEC) * F.col("wn").cast(DEC),
    )
    agg = cum.groupBy("key").agg(
        F.max("n_eff").alias("n_eff"),
        F.max("dd").alias("dd"),
        # loss sums over the COMPARABLE region only (both lags
        # defined), so sum_la - sum_lb == sum_d exactly
        F.sum(F.when(F.col("d").isNotNull(), F.col("la"))).alias("sum_la"),
        F.sum(F.when(F.col("d").isNotNull(), F.col("lb"))).alias("sum_lb"),
        F.sum(F.col("e") * F.col("e")).alias("g0"),
        F.sum(F.col("e") * F.col("wl")).alias("gw"),
        F.max(F.abs("d")).alias("_dmax"),
    )
    agg = agg.withColumn(
        "n_eff",
        F.when(
            F.col("_dmax").cast(DEC) * F.lit(72).cast(DEC)
            > F.lit("9000000000000000000").cast(DEC),
            F.raise_error(
                "diebold_mariano: int64 envelope exceeded (|loss "
                "differential| too large for the Bartlett fold) — "
                "re-bucket to a coarser tier first"
            ).cast("long"),
        ).otherwise(F.col("n_eff")),
    )
    s = (F.lit(lp1).cast(DEC) * F.col("g0") + F.col("gw")).alias("s")
    out = agg.withColumn("s", s)
    dm = (
        F.col("dd").cast("double")
        * F.col("n_eff").cast("double")
        * F.sqrt(F.lit(float(lp1)) / F.col("s").cast("double"))
    )
    return out.select(
        "key",
        F.col("n_eff").cast("long").alias("n_eff"),
        F.col("sum_la").cast("long").alias("sum_la"),
        F.col("sum_lb").cast("long").alias("sum_lb"),
        F.col("dd").cast("long").alias("sum_d"),
        F.when(F.col("s") > 0, F.round(dm, 6) + F.lit(0.0)).alias("dm"),
    )
