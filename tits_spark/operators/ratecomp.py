"""Two-exposure Poisson rate comparison per key: is the weekend
EVENT RATE (events per calendar day) different from the weekday
rate?  The conditional (binomial) test — given N total events and
known exposures t1/t2 days, the weekend count is Binomial(N,
t1/(t1+t2)) under equal rates (Przyborowski & Wilenski 1940; the
standard two-Poisson-means conditional test) — plus the raw rate
ratio.  Distinct from welch_t (VALUE levels), cmh (error odds) and
zero_inflation (zero mass): this is the volume-per-day readout an
on-call dashboard wants.

Everything is exact integer arithmetic until two final double trees:
events carry their epoch day d = us // 86.4e9 and the weekend flag
(d+4) % 7 in {0, 6} (epoch day 0 = a Thursday; 0=Sunday encoding);
the weekend-day EXPOSURE over the span [lo, hi] uses the closed form

    count(dow = w) = (hi - a) // 7 + 1,
    a = lo + ((w - (lo + 4)) mod 7)      (a = first such day >= lo)

— two floor-divisions per weekday, no spine explode (the same
span-arithmetic discipline as zero_inflation).  With c1 weekend
events, c2 weekday events, p = t1/(t1+t2):

    z = (c1 - N p) / sqrt(N p (1 - p))
    rate_ratio = (c1/t1) / (c2/t2)

round 6, signed zero normalized; degenerate exposures (span inside
one week part: t1 = 0 or t2 = 0) or N = 0 emit NULL.

Plan: one (key, d) hash agg -> one per-key hash agg.  No window, no
join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

US_PER_DAY = 86_400_000_000


def _count_dow(lo: Column, hi: Column, w: int) -> Column:
    """Days d in [lo, hi] with (d+4) % 7 == w, exact integers."""
    off = ((F.lit(w) - (lo + 4)) % 7 + 7) % 7
    a = lo + off
    return F.when(a > hi, F.lit(0)).otherwise(
        F.floor((hi - a) / 7).cast("long") + 1
    )


def weekend_rate_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 14,
) -> DataFrame:
    """Conditional Poisson rate test, weekend vs weekday, per key.

    Returns (key, n_days, t_weekend, c_weekend, c_weekday, rate_z,
    rate_ratio); keys with a span under ``min_days`` drop."""
    daily = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(US_PER_DAY)).cast("long").alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wk = ((F.col("d") + 4) % 7).isin(0, 6)
    agg = (
        daily.groupBy("key")
        .agg(
            F.min("d").alias("lo"),
            F.max("d").alias("hi"),
            F.sum(F.when(wk, F.col("c")).otherwise(0)).alias("c1"),
            F.sum(F.when(~wk, F.col("c")).otherwise(0)).alias("c2"),
        )
        .filter((F.col("hi") - F.col("lo") + 1) >= int(min_days))
    )
    lo = F.col("lo")
    hi = F.col("hi")
    t1 = (_count_dow(lo, hi, 0) + _count_dow(lo, hi, 6)).cast("long")
    span = (hi - lo + 1).cast("long")
    t2 = span - t1
    withe = agg.select(
        "key",
        span.alias("n_days"),
        t1.alias("t1"),
        t2.alias("t2"),
        "c1",
        "c2",
    )
    nn = (F.col("c1") + F.col("c2")).cast("double")
    p = F.col("t1").cast("double") / (
        F.col("t1") + F.col("t2")
    ).cast("double")
    var = nn * p * (F.lit(1.0) - p)
    z = F.when(
        (F.col("t1") > 0) & (F.col("t2") > 0) & (var > 0),
        F.round(
            (F.col("c1").cast("double") - nn * p) / F.sqrt(var), 6
        )
        + F.lit(0.0),
    )
    rr = F.when(
        (F.col("t1") > 0) & (F.col("t2") > 0) & (F.col("c2") > 0),
        F.round(
            (F.col("c1").cast("double") / F.col("t1").cast("double"))
            / (F.col("c2").cast("double") / F.col("t2").cast("double")),
            6,
        )
        + F.lit(0.0),
    )
    return withe.select(
        "key",
        "n_days",
        F.col("t1").alias("t_weekend"),
        F.col("c1").cast("long").alias("c_weekend"),
        F.col("c2").cast("long").alias("c_weekday"),
        z.alias("rate_z"),
        rr.alias("rate_ratio"),
    )


def weekend_rate_prefix(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 14,
) -> DataFrame:
    """The closed-day prefix ledger of :func:`weekend_rate_test`: one
    row per CLOSED observed day D (a day closes when a later day's
    event exists) carrying the rate test over the prefix [lo, D] —
    the replayable form a streaming monitor emits as days roll over
    (risk_stream's closed-day discipline; twin #33 in
    streaming/rate_stream.py is bit-equal by construction).

    Same integer surfaces as weekend_rate_test, evaluated per prefix
    via ONE cumulative window over the (key, day) lattice; the
    weekend-day exposure over [lo, D] is the same closed form.

    Returns (key, day, n_days, t_weekend, c_weekend, c_weekday,
    rate_z, rate_ratio) for prefixes spanning >= ``min_days``."""
    daily = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(US_PER_DAY)).cast("long").alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("key")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("key")
    wk = ((F.col("d") + 4) % 7).isin(0, 6)
    cum = daily.select(
        "key",
        "d",
        F.min("d").over(wall).alias("lo"),
        F.max("d").over(wall).alias("mx"),
        F.sum(F.when(wk, F.col("c")).otherwise(0)).over(wcum).alias("c1"),
        F.sum(F.when(~wk, F.col("c")).otherwise(0)).over(wcum).alias("c2"),
    ).filter(F.col("d") < F.col("mx"))
    lo = F.col("lo")
    hi = F.col("d")
    t1 = (_count_dow(lo, hi, 0) + _count_dow(lo, hi, 6)).cast("long")
    span = (hi - lo + 1).cast("long")
    t2 = span - t1
    base = cum.select(
        "key",
        F.col("d").alias("day"),
        span.alias("n_days"),
        t1.alias("t1"),
        t2.alias("t2"),
        "c1",
        "c2",
    ).filter(F.col("n_days") >= int(min_days))
    nn = (F.col("c1") + F.col("c2")).cast("double")
    p = F.col("t1").cast("double") / (
        F.col("t1") + F.col("t2")
    ).cast("double")
    var = nn * p * (F.lit(1.0) - p)
    # RAW doubles (no round): the stream twin computes the identical
    # float tree per emission, so rows match bit-for-bit (the theta
    # precedent) without a rounding step to diverge on
    z = F.when(
        (F.col("t1") > 0) & (F.col("t2") > 0) & (var > 0),
        (F.col("c1").cast("double") - nn * p) / F.sqrt(var),
    )
    rr = F.when(
        (F.col("t1") > 0) & (F.col("t2") > 0) & (F.col("c2") > 0),
        (F.col("c1").cast("double") / F.col("t1").cast("double"))
        / (F.col("c2").cast("double") / F.col("t2").cast("double")),
    )
    return base.select(
        "key",
        "day",
        "n_days",
        F.col("t1").alias("t_weekend"),
        F.col("c1").cast("long").alias("c_weekend"),
        F.col("c2").cast("long").alias("c_weekday"),
        z.alias("rate_z"),
        rr.alias("rate_ratio"),
    )
