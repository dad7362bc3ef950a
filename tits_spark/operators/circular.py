"""Circular (time-of-day) statistics per key — is a key's activity
uniformly spread around the clock, or concentrated at a phase?

Events at microsecond timestamps wrap onto the 24h circle as angles
theta = 2*pi * us_of_day / 86400e6; the resultant

    C = sum cos(theta),  S = sum sin(theta)
    Rbar = sqrt(C^2 + S^2) / n          (mean resultant length)
    z    = n * Rbar^2                   (Rayleigh test statistic;
                                         Rayleigh 1880 / Mardia & Jupp
                                         2000, public formula)

Rbar ~ 0 means around-the-clock activity (a service, a bot); Rbar
near 1 means a tight daily phase (a human, a cron) — the circular
complement of hourly_profile (which bins) and seasonal_peak (which
argmaxes): this one is the proper test with a significance statistic,
and it needs no binning at all.

Determinism: the angle is built from the EXACT integer microsecond-
of-day (us % 86400e6 — int64 arithmetic, identical cross-engine);
cos/sin/the sums are doubles, so like perio_declarative (the repo's
precedent for trig aggregation) the outputs are round-6, which
absorbs both partial-sum reassociation and last-ulp libm differences
(observed diffs ~1e-15, six orders below the rounding quantum). The
mean DIRECTION is intentionally emitted as the (c_bar, s_bar) pair
rather than an hour-of-day angle: an angle representation has a wrap
boundary at 24h == 0h where a last-ulp sign flip of S would swing the
rounded value by 24.0 — the pair has no boundary.

Plan shape: one scan, one hash aggregate (map-side partials), zero
joins, zero windows, zero UDFs — the cheapest family in the repo, and
it composes: group by (key) here, by (key, week) for phase drift.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

_DAY_US = 86_400_000_000


def rayleigh_uniformity(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_points: int = 8,
) -> DataFrame:
    """Per-key Rayleigh uniformity test of event time-of-day.

    Returns (key, n_obs, c_bar, s_bar, rbar, z): the mean resultant
    components, the mean resultant length and the Rayleigh statistic
    n*Rbar^2, all round-6 doubles over one hash aggregate. Keys with
    fewer than ``min_points`` events are dropped (the test is
    meaningless on a handful of points).
    """
    usod = epoch_us(ts) % F.lit(_DAY_US)
    theta = F.lit(2.0 * math.pi) * usod.cast("double") / F.lit(float(_DAY_US))
    rows = df.select(
        F.col(key).alias("key"),
        F.cos(theta).alias("ct"),
        F.sin(theta).alias("st"),
    )
    agg = (
        rows.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("ct").alias("cs"),
            F.sum("st").alias("ss"),
        )
        .filter(F.col("n_obs") >= int(min_points))
    )
    n = F.col("n_obs").cast("double")
    r2 = F.col("cs") * F.col("cs") + F.col("ss") * F.col("ss")
    return agg.select(
        "key",
        "n_obs",
        (F.round(F.col("cs") / n, 6) + F.lit(0.0)).alias("c_bar"),
        (F.round(F.col("ss") / n, 6) + F.lit(0.0)).alias("s_bar"),
        F.round(F.sqrt(r2) / n, 6).alias("rbar"),
        F.round(r2 / n, 6).alias("z"),
    )


def kuiper_uniformity(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_points: int = 8,
) -> DataFrame:
    """Per-key Kuiper V test of time-of-day uniformity — the
    rotation-invariant ECDF companion of :func:`rayleigh_uniformity`
    (Kuiper 1960; Stephens 1970 modification, public formulae).

    Rayleigh only sees the FIRST circular moment (a key active at
    exactly 06:00 and 18:00 has resultant ~0 and looks uniform);
    Kuiper compares the empirical CDF of microsecond-of-day against
    the uniform ramp and is sensitive to any departure, yet (unlike a
    naive KS on the wrapped value) assigns the same statistic no
    matter where the day is cut:

        D+ = max_i ( i/n  - u_(i)/DAY )
        D- = max_i ( u_(i)/DAY - (i-1)/n )
        V  = D+ + D-
        Vn = V * (sqrt(n) + 0.155 + 0.24/sqrt(n))   (Stephens 1970)

    Exactness: u_(i) is the EXACT int64 microsecond-of-day; clearing
    the denominators makes both maxima integer lattices,

        dp_num = max_i ( i*DAY - n*u_(i) )
        dm_num = max_i ( n*u_(i) - (i-1)*DAY )

    so the per-key reduction is a pure BIGINT max — no float ever
    enters until the single V = (dp_num + dm_num)/(n*DAY) division
    (round 6). Ties on u are harmless: within a tie group both
    expressions are monotone in i, so row_number order inside the
    group never moves the max (the ECDF's top step wins). Bound:
    |i*DAY|, |n*u| <= n * 86.4e9 — int64-exact for n <= 1e8 events
    per key; beyond that, run it on a rolled-up tier (the engine's
    standard retention discipline, cf. kpss.py's envelope note).

    Plan shape: one scan, one per-key sort window (row_number + two
    running maxima ride the same exchange), one hash agg. No join,
    no UDF, no grid.
    """
    from pyspark.sql import Window

    usod = (epoch_us(ts) % F.lit(_DAY_US)).alias("u")
    rows = df.select(F.col(key).alias("key"), usod)
    w = Window.partitionBy("key").orderBy("u")
    wk = Window.partitionBy("key")
    ranked = rows.select(
        "key",
        "u",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    dp = F.col("i") * F.lit(_DAY_US) - F.col("n") * F.col("u")
    dm = F.col("n") * F.col("u") - (F.col("i") - 1) * F.lit(_DAY_US)
    agg = (
        ranked.groupBy("key")
        .agg(
            F.max("n").alias("n_obs"),
            F.max(dp).alias("dp_num"),
            F.max(dm).alias("dm_num"),
        )
        .filter(F.col("n_obs") >= int(min_points))
    )
    n = F.col("n_obs").cast("double")
    v = (F.col("dp_num") + F.col("dm_num")).cast("double") / (
        n * F.lit(float(_DAY_US))
    )
    vn = v * (F.sqrt(n) + F.lit(0.155) + F.lit(0.24) / F.sqrt(n))
    return agg.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("dp_num").cast("long").alias("dp_num"),
        F.col("dm_num").cast("long").alias("dm_num"),
        F.round(v, 6).alias("v"),
        F.round(vn, 6).alias("vn_stat"),
    )


def watson_u2(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_n: int = 50,
) -> DataFrame:
    """Watson's U^2 circular uniformity test per key (Watson,
    Biometrika 1961): the rotation-invariant Cramer-von Mises — the
    proper EDF companion to kuiper_uniformity (circular KS) and
    rayleigh_uniformity (first-harmonic only; blind to bimodal
    schedules, which U^2 catches).  No binning: the sample value is
    the EXACT integer microsecond-of-day U in [0, D), u = U/D.

    Exactness: with per-cell counts c on the (key, U) tie lattice,
    cumulative position b, a = b - c, and integer masses
    IA = sum c*U^2, IB = sum U*(b^2 - a^2)  [the closed form of
    sum (2i-1) u over a tie span], IS = sum c*U, the textbook

        U^2 = W^2 - n*(ubar - 1/2)^2,
        W^2 = sum (u_(i) - (2i-1)/(2n))^2 + 1/(12n)

    clears completely over the common denominator D^2 n:

        U^2 * D^2 n = n*IA - D*IB + (D^2/3)*n^2 - (IS - n*D/2)^2

    (D = 86.4e9 is divisible by 6, so D^2/3 and D/2 are exact
    integers).  Everything accumulates in decimal(38,0) — inside
    range to n ~ 1e7 rows/key — and U^2 is ONE double division,
    round 6.  Also emits Stephens' modified statistic
    u2_star = (U^2 - 0.1/n + 0.1/n^2)(1 + 0.8/n) whose 5%/1% points
    are 0.187/0.267 for all n.

    Plan shape: hash agg to the (key, U) lattice -> ONE (key)-window
    cumulative count -> one hash agg on the same exchange (the tie-
    grid family shape).  No joins, no Python, no global window.

    Returns (key, n, is_sum, u2, u2_star); keys under ``min_n`` drop.
    """
    from pyspark.sql import Window

    DEC = "decimal(38,0)"
    d_half = _DAY_US // 2
    k_third = str((_DAY_US * _DAY_US) // 3)
    lat = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) % F.lit(_DAY_US)).alias("u"),
        )
        .groupBy("key", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("u")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = lat.select(
        "key",
        "c",
        "u",
        F.sum("c").over(wcum).alias("b"),
    )
    a = F.col("b") - F.col("c")
    uu = F.col("u").cast(DEC)
    agg = (
        cum.groupBy("key")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c").cast(DEC) * uu * uu).alias("_ia"),
            F.sum(
                uu
                * (
                    F.col("b").cast(DEC) * F.col("b")
                    - a.cast(DEC) * a
                ).cast(DEC)
            ).alias("_ib"),
            F.sum(F.col("c").cast(DEC) * uu).alias("_is"),
        )
        .filter(F.col("n") >= int(min_n))
    )
    nd = F.col("n").cast(DEC)
    dd = F.lit(_DAY_US).cast(DEC)
    kk = F.expr(f"CAST('{k_third}' AS DECIMAL(38,0))")
    ctr = (F.col("_is") - nd * F.lit(d_half).cast(DEC)).cast(DEC)
    num = (
        nd * F.col("_ia")
        - dd * F.col("_ib")
        + kk * (nd * nd).cast(DEC)
        - (ctr * ctr).cast(DEC)
    ).cast(DEC)
    den = (
        F.lit(float(_DAY_US)) * F.lit(float(_DAY_US))
    ) * F.col("n").cast("double")
    t = num.cast("double") / den
    ninv = F.col("n").cast("double")
    star = (
        t - F.lit(0.1) / ninv + F.lit(0.1) / (ninv * ninv)
    ) * (F.lit(1.0) + F.lit(0.8) / ninv)
    return agg.select(
        "key",
        "n",
        F.col("_is").cast("long").alias("is_sum"),
        (F.round(t, 6) + F.lit(0.0)).alias("u2"),
        (F.round(star, 6) + F.lit(0.0)).alias("u2_star"),
    )
