"""Friedman test per key — does the DAY OF WEEK shift a key's
activity level, once each week is allowed its own level? (Friedman
1937, public formula; the tie-corrected form, e.g. Conover 1999.)

The complete-block companion of kruskal_wallis (which pools all days
into independent samples and is blind to week-to-week drift): blocks
= week index (epoch-day // 7), treatments = weekday (epoch-day % 7) —
pure integer arithmetic, no calendar, identical cross-engine. The
blocked design cancels trend/level differences BETWEEN weeks; ranking
within each week isolates the weekday effect.

Cell values are DAILY EVENT COUNTS with explicit zero-fill: the daily
partial aggregate gap-fills missing days by the bounded
explode-to-next-observation device (locf_bucket_grid's shape, but
carrying 0 instead of the last value — a count, unlike a gauge, IS
zero on a silent day), so every week inside the key's observed span
[min_day, max_day] is complete BY CONSTRUCTION and enters; boundary
part-weeks are dropped. Ranks are midranks within each block on the
DOUBLED integer lattice (2*midrank = 2*rank_min + t - 1 for a tie
group of size t — rank_tests.py's device; zero-heavy count rows make
the tie correction load-bearing, not decorative). With k = 7 and n
complete weeks, R2_j = sum of doubled midranks of weekday j and A4 =
sum of squared doubled midranks:

    chi2 = (k-1) * sum_j (R2_j - 8n)^2 / (A4 - 448n)

— numerator and denominator EXACT int64 (the 2x/4x scalings cancel),
chi2 one fixed double tree, NULL when every day of every week is tied
(A4 == 448n). ~chi2(6) under H0.

Scale shape: one raw scan -> one (key, day) hash aggregate (the daily
partial collapses 10^12 turns to key-days BEFORE anything else), one
(key)-window gap explode bounded by the span in days, block windows
and two bounded aggregates — no join, no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

DAY_US = 86_400_000_000
K = 7  # weekday treatments


def weekday_cells(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
) -> DataFrame:
    """The balanced complete-week design shared by this module's
    Friedman test and the parametric one-way pair in operators/anova.py
    (ANOVA F + Brown-Forsythe): (key, blk, trt, c) where blk =
    epoch-day // 7, trt = weekday (epoch-day % 7) and c is the DAILY
    EVENT COUNT with explicit zero-fill over the key's span — every
    retained week is complete BY CONSTRUCTION (boundary part-weeks
    drop), so each weekday group has exactly n_blocks observations and
    balanced-design algebra (equal n_j) is sound, not an assumption.
    One raw scan -> one (key, day) hash aggregate -> one bounded gap
    explode; no join, no UDF.
    """
    daily = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), DAY_US).alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("n_day"))
    )
    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("d")
    spine = (
        daily.withColumn("mn", F.min("d").over(wk))
        .withColumn("mx", F.max("d").over(wk))
        .withColumn("nd", F.lead("d").over(wo))
        .select(
            "key",
            "d",
            "n_day",
            "mn",
            "mx",
            F.explode(
                F.sequence(F.col("d"), F.coalesce(F.col("nd") - 1, F.col("d")))
            ).alias("dd"),
        )
        .select(
            "key",
            "mn",
            "mx",
            F.col("dd"),
            F.when(F.col("dd") == F.col("d"), F.col("n_day"))
            .otherwise(F.lit(0))
            .alias("c"),
        )
    )
    blk = floordiv(F.col("dd"), K)
    return spine.select(
        "key",
        blk.alias("blk"),
        (F.col("dd") - blk * K).alias("trt"),
        "c",
        "mn",
        "mx",
    ).filter(
        (F.col("blk") * K >= F.col("mn"))
        & (F.col("blk") * K + (K - 1) <= F.col("mx"))
    ).drop("mn", "mx")


def friedman_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Per-key Friedman test of weekday effect on daily event counts
    over complete weeks.

    Returns (key, n_blocks, num, a4, chi2): the complete-week count,
    the exact integer numerator sum_j (R2_j - 8n)^2 and doubled-
    midrank square sum A4, and the tie-corrected statistic (round 6,
    NULL when all-tied). Keys with fewer than ``min_blocks`` complete
    weeks are dropped.
    """
    cells = weekday_cells(df, key=key, ts=ts)
    wr = Window.partitionBy("key", "blk").orderBy("c")
    wt = Window.partitionBy("key", "blk", "c")
    ranked = cells.withColumn(
        "r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    per_trt = ranked.groupBy("key", "trt").agg(
        F.sum("r2").alias("r2j"),
        F.sum(F.col("r2") * F.col("r2")).alias("a4p"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = F.col("r2j") - (K + 1) * F.col("n")
    per_key = (
        per_trt.groupBy("key")
        .agg(
            F.max("n").alias("n_blocks"),
            F.sum(dev * dev).alias("num"),
            F.sum("a4p").alias("a4"),
        )
        .filter(F.col("n_blocks") >= int(min_blocks))
    )
    denom = F.col("a4") - F.lit(K * (K + 1) * (K + 1)) * F.col("n_blocks")
    chi2 = F.when(
        denom > 0,
        F.round(
            F.lit(float(K - 1)) * F.col("num").cast("double")
            / denom.cast("double"),
            6,
        ),
    )
    return per_key.select(
        "key",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        "num",
        "a4",
        chi2.alias("chi2"),
    )


HOUR_US = 3_600_000_000
K24 = 24


def page_trend_hourly(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Per-key Page trend test (Page 1963, public formula): do hourly
    event counts trend MONOTONICALLY over the day, day after day?

    The ordered-alternative companion of friedman_weekday: Friedman
    asks "does the treatment matter at all"; Page weights each
    treatment's rank sum by its position, so a consistent
    within-block ordering (counts rising — or falling — through the
    day) accumulates where an unordered shuffle cancels. Blocks are
    complete UTC days (epoch-hour // 24 — zero-filled from the hourly
    partial aggregate by the same bounded gap explode as the weekday
    spine, boundary part-days dropped), treatments the 24 hours:

        L = sum_j j * R_j    (j = hour + 1, R_j = rank sum of hour j)

    Ranks are doubled midranks on the integer lattice (zero-heavy
    hours make ties the common case, and the all-tied block
    contributes exactly its null expectation to L, so silent days
    never bias the trend). l2 = 2L is EXACT int64; the z-score uses
    the tie-free large-sample null (the standard published form —
    the tie-exact variance has no closed form),

        E[L] = n*k*(k+1)^2/4          Var[L] = n*k^2*(k+1)^2*(k-1)/144
        z    = (l2 - 2*E[L]) / (2*sqrt(Var[L]))

    with k = 24 the constants fold: z = (l2 - 7500*n) /
    (2*sqrt(57500*n)). Positive z = activity rises through the UTC
    day; |z| > 1.96 rejects "no consistent intra-day ordering".

    Plan shape: one raw scan -> one (key, hour) hash aggregate (the
    10^12-turn stream collapses to key-hours first) -> bounded gap
    explode (24x the day-spine width, still span-bounded) -> one
    block-rank window -> one hash agg. No join, no UDF.
    """
    hourly = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), HOUR_US).alias("h"),
        )
        .groupBy("key", "h")
        .agg(F.count(F.lit(1)).alias("n_h"))
    )
    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("h")
    spine = (
        hourly.withColumn("mn", F.min("h").over(wk))
        .withColumn("mx", F.max("h").over(wk))
        .withColumn("nh", F.lead("h").over(wo))
        .select(
            "key",
            "h",
            "n_h",
            "mn",
            "mx",
            F.explode(
                F.sequence(F.col("h"), F.coalesce(F.col("nh") - 1, F.col("h")))
            ).alias("hh"),
        )
        .select(
            "key",
            "mn",
            "mx",
            F.col("hh"),
            F.when(F.col("hh") == F.col("h"), F.col("n_h"))
            .otherwise(F.lit(0))
            .alias("c"),
        )
    )
    blk = floordiv(F.col("hh"), K24)
    cells = spine.select(
        "key",
        blk.alias("blk"),
        (F.col("hh") - blk * K24).alias("trt"),
        "c",
    ).filter(
        (blk * K24 >= F.col("mn")) & (blk * K24 + (K24 - 1) <= F.col("mx"))
    )
    wr = Window.partitionBy("key", "blk").orderBy("c")
    wt = Window.partitionBy("key", "blk", "c")
    ranked = cells.withColumn(
        "r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    per_key = (
        ranked.groupBy("key")
        .agg(
            (F.count(F.lit(1)) / K24).cast("long").alias("n_blocks"),
            F.sum((F.col("trt") + 1) * F.col("r2")).alias("l2"),
        )
        .filter(F.col("n_blocks") >= int(min_blocks))
    )
    n = F.col("n_blocks").cast("double")
    z = (F.col("l2").cast("double") - F.lit(7500.0) * n) / (
        F.lit(2.0) * F.sqrt(F.lit(57500.0) * n)
    )
    return per_key.select(
        "key",
        "n_blocks",
        F.col("l2").cast("long").alias("l2"),
        (F.round(z, 6) + F.lit(0.0)).alias("z"),
    )


def kendall_w_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Kendall's coefficient of concordance W per key (Kendall &
    Babington Smith 1939) on the same complete-week weekday design as
    :func:`friedman_weekday` — the EFFECT-SIZE companion of that
    test: chi2 says "a weekday effect exists", W in [0, 1] says how
    strongly the weeks agree on the weekday ORDERING (1 = every week
    ranks the days identically).  With the tie correction, W relates
    to the Friedman statistic exactly by chi2 = n (k-1) W, so on the
    doubled-midrank lattice

        W = num / (n * (A4 - 448 n))

    with num and A4 friedman_weekday's exact int64 columns — the
    division is the ONLY float op, round 6, NULL on the all-tied
    denominator.  Plan: friedman_weekday's plus one projection.

    Returns (key, n_blocks, num, a4, kendall_w)."""
    f = friedman_weekday(df, key=key, ts=ts, min_blocks=min_blocks)
    denom = F.col("a4") - F.lit(K * (K + 1) * (K + 1)) * F.col("n_blocks")
    w = F.when(
        denom > 0,
        F.round(
            F.col("num").cast("double")
            / (F.col("n_blocks") * denom).cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return f.select("key", "n_blocks", "num", "a4", w.alias("kendall_w"))
