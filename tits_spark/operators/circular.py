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
