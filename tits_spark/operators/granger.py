"""Granger causality (1 lag) between two irregular series on a shared
LOCF grid — "do X's past values help predict Y beyond Y's own past?"

The complement of the HY/HRY lead-lag scan (operators/asynccov.py):
HRY finds the shift that maximizes covariance; Granger tests whether
the cross-lag carries PREDICTIVE content, via the classic restricted-
vs-unrestricted regression F-test (Granger 1969, public formula):

    restricted:    y_t = a + b*y_{t-1}            -> RSS_r
    unrestricted:  y_t = a + b*y_{t-1} + c*x_{t-1} -> RSS_u
    F = (RSS_r - RSS_u) * (n - 3) / RSS_u          (1, n-3) df

Irregular series are aligned tits-style first: hourly buckets take
each side's LAST tick (ref:/root/reference/src/tits.c rollup tiers
keep last-in-bucket), gaps are LOCF-filled over the key's joint
bucket span (the reference's gap-aware alignment), and the lags are
grid lags. The grid is ONE raw scan + two exchanges + zero joins
(see locf_bucket_grid) with a bounded gap-fill explode
(span/3600 buckets per key) — no range join, no UDF.

Exactness: cents-quantized values; ALL regression moments are exact
(BIGINT cent sums, centered second moments M_uv = n*S_uv - S_u*S_v in
decimal(38,0)). Each M is < 2^53 for spans up to ~20k buckets at
full 6-figure cent magnitudes, so the decimal->double conversion is
EXACT, and the final F/b/c are one identical double expression tree
on both engines (IEEE ops are correctly rounded, so identical inputs
+ identical tree = identical doubles). Guards return NULL when a
regressor is constant or collinear (det = 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

DEC = "decimal(38,0)"


def locf_bucket_grid(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Shared tits-style two-sided alignment grid: (key, b, xc, yc)
    with one row per bucket of each key's joint span, both sides
    last-in-bucket then LOCF-filled (cents-quantized BIGINT values;
    NULL before a side's first tick). Downstream consumers (Granger,
    transfer entropy) see the identical grid.

    Plan shape (the 100 TB argument): ONE raw scan, TWO exchanges,
    ZERO joins. The duplicate-tick collapse and per-side last-in-bucket
    fuse into a single (key, bucket) hash aggregate — ``max(struct(us,
    c))`` is lexicographic, so it picks the latest tick and breaks
    equal-timestamp ties on max cents, exactly the documented two-step
    (max-c per us, then last us) determinism rule. Bucket gaps are then
    filled by exploding ``sequence(b, next_b - 1)`` inside one
    (key)-ordered window pass that also carries the LOCF values — no
    spine frame, no side-frames, no join back (the old spine+2-join
    formulation re-ran the raw scan three times and broadcast frames
    that grow with the data). The explode stays bounded by
    span / bucket_secs rows per key."""
    bus = int(bucket_secs) * 1_000_000
    ticks = df.select(
        F.col(key).alias("key"),
        F.col(series).alias("s"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    )
    pv = (
        ticks.withColumn("b", floordiv(F.col("us"), bus))
        .groupBy("key", "b")
        .agg(
            F.max(
                F.when(F.col("s") == x_side, F.struct("us", "c"))
            )["c"].alias("xc0"),
            F.max(
                F.when(F.col("s") == y_side, F.struct("us", "c"))
            )["c"].alias("yc0"),
        )
    )
    wl = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("key").orderBy("b")
    filled = pv.select(
        "key",
        "b",
        F.last("xc0", ignorenulls=True).over(wl).alias("xc"),
        F.last("yc0", ignorenulls=True).over(wl).alias("yc"),
        F.lead("b").over(wo).alias("nb"),
    )
    return filled.select(
        "key",
        F.explode(
            F.sequence(
                F.col("b"),
                F.coalesce(F.col("nb") - 1, F.col("b")),
            )
        ).alias("b"),
        "xc",
        "yc",
    )


def granger_1lag(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key 1-lag Granger F-test of x -> y on the LOCF bucket grid.

    Returns (key, n_obs, b_ar, c_x, f_stat): the sample count, the
    restricted AR(1) coefficient, the unrestricted cross coefficient,
    and the F statistic (round 6, NULL when degenerate). Keys appear
    when >= 4 grid rows have (y_t, y_{t-1}, x_{t-1}) all resolved.
    """
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    wo = Window.partitionBy("key").orderBy("b")
    rows = grid.select(
        "key",
        F.col("yc").alias("y"),
        F.lag("yc").over(wo).alias("a"),   # y_{t-1}
        F.lag("xc").over(wo).alias("x"),   # x_{t-1}
    ).filter(
        F.col("y").isNotNull() & F.col("a").isNotNull()
        & F.col("x").isNotNull()
    )

    d = lambda c: F.col(c).cast(DEC)  # noqa: E731
    sums = rows.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("a")).alias("sa"),
        F.sum(d("x")).alias("sx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).alias("syy"),
        F.sum((F.col("a") * F.col("a")).cast(DEC)).alias("saa"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).alias("sxx"),
        F.sum((F.col("a") * F.col("y")).cast(DEC)).alias("say"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).alias("sxy"),
        F.sum((F.col("a") * F.col("x")).cast(DEC)).alias("sax"),
    ).filter(F.col("n") >= 4)

    n = F.col("n").cast(DEC)
    # centered moments, exact in decimal(38,0), each < 2^53 -> the
    # double conversion below is exact
    m = {
        "maa": n * F.col("saa") - F.col("sa") * F.col("sa"),
        "mxx": n * F.col("sxx") - F.col("sx") * F.col("sx"),
        "mab": n * F.col("sax") - F.col("sa") * F.col("sx"),
        "may": n * F.col("say") - F.col("sa") * F.col("sy"),
        "mxy": n * F.col("sxy") - F.col("sx") * F.col("sy"),
        "myy": n * F.col("syy") - F.col("sy") * F.col("sy"),
    }
    mom = sums.select(
        "key", F.col("n").cast("long").alias("n_obs"),
        *[v.cast("double").alias(k) for k, v in m.items()],
    )
    # ONE double expression tree, written identically in the oracle
    maa, mxx, mab = F.col("maa"), F.col("mxx"), F.col("mab")
    may, mxy, myy = F.col("may"), F.col("mxy"), F.col("myy")
    det = maa * mxx - mab * mab
    rss_r = myy - may * may / maa
    rss_u = myy - (mxx * may * may - 2.0 * mab * may * mxy
                   + maa * mxy * mxy) / det
    nn = F.col("n_obs").cast("double")
    return mom.select(
        "key", "n_obs",
        F.when(maa > 0, F.round(may / maa, 6) + F.lit(0.0)).alias("b_ar"),
        F.when(det > 0,
               F.round((maa * mxy - mab * may) / det, 6) + F.lit(0.0)
               ).alias("c_x"),
        F.when(
            (maa > 0) & (det > 0) & (rss_u > 0),
            F.round((rss_r - rss_u) * (nn - 3.0) / rss_u, 6) + F.lit(0.0),
        ).alias("f_stat"),
    )
