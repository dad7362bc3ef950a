"""Binary activity tests per key — Cochran's Q (blocked) and McNemar
(paired): the presence/absence layer under friedman/anova, which see
LEVELS. A key can keep its daily volume flat yet change WHICH days it
shows up at all; these two see exactly that. (Cochran 1950; McNemar
1947 — public formulae.)

Cochran runs on the zero-filled daily spine (friedman's device): the
binary cell is x = 1 iff the day's event count > 0, so "silent day"
is data, not absence of data. McNemar pairs the two halves of each
OBSERVED day (concordant and silent days cancel out of its statistic
by construction, so it needs no spine at all).

Cochran's Q — does the PROBABILITY of being active depend on the
weekday, blocked by week? With k = 7 treatments over n complete
weeks, column totals C_j (active weeks per weekday), row totals R_b
(active days per week), N = sum C_j:

    Q = (k-1) * (k * sum_j C_j^2 - N^2) / (k*N - sum_b R_b^2)

~ chi2(6) under H0. EVERY quantity is an exact int64 (counts and
squares of counts bounded by n and 7n); Q is one double division.
All-0 and all-7 weeks carry no discrimination — when every week is
one of those the denominator k*N - sum R_b^2 = sum_b R_b*(k - R_b)
is 0 and Q is NULL (exact integer test, identical cross-engine).

McNemar — within a day, is MORNING activity (UTC hours 0-11)
matched by EVENING activity (hours 12-23)? The classic paired-binary
design: each observed day contributes the pair (x = any morning
event, y = any evening event), and only the DISCORDANT days count,

    b = #(morning only)   c = #(evening only)
    chi2 = (b - c)^2 / (b + c)        (NULL when never discordant)

— the marginal-homogeneity screen for intra-day coverage: a key
whose evening-only days outnumber morning-only days is drifting its
activity later even if hourly volume statistics look flat. (A naive
"did activity switch between consecutive days" pairing is DEGENERATE
here: the observed span starts and ends on an active day, so onset
and offset counts are always equal — the paired within-day design is
the real test.) Concordant days (both or neither half active) drop
out of the statistic by construction, so silent days never need
zero-filling.

Plan shape: Cochran rides the (key, day) partial aggregate and the
bounded gap explode (one raw scan, two exchanges); the row-total
square sum telescopes onto the cells (sum_cells rb*x == sum_b rb^2),
so one (key, blk) window plus one grouping chain — all on hash(key),
no per-block join-back; McNemar is a single
(key, day) partial with two conditional half-day maxima folded into
one (key) hash aggregate — no window, no join, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.friedman import K, weekday_cells
from tits_spark.functions.exprs import epoch_us, floordiv

DAY_US = 86_400_000_000


def cochran_q_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Per-key Cochran Q test of weekday effect on daily ACTIVITY
    (active = any event) over complete weeks.

    Returns (key, n_blocks, n_act, sum_cj2, sum_rb2, q_stat): the
    complete-week count, total active days N, the exact integer
    column/row square sums, and Q (round 6; NULL when no week
    discriminates)."""
    cells = weekday_cells(df, key=key, ts=ts).select(
        "key", "blk", "trt", (F.col("c") > 0).cast("int").alias("x")
    )
    # Sum_b rb^2 telescopes onto the cells: sum_cells rb*x = sum_b rb^2
    # (within block b the x's sum to rb), so ONE window + one grouping
    # chain replaces the per-block aggregate and its join-back — the
    # (key, blk) window and both groupings all ride hash(key)
    wb = Window.partitionBy("key", "blk")
    with_rb = cells.withColumn("rb", F.sum("x").over(wb))
    per_trt = with_rb.groupBy("key", "trt").agg(
        F.sum("x").alias("cj"),
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.col("rb") * F.col("x")).alias("p_rb2"),
    )
    agg = (
        per_trt.groupBy("key")
        .agg(
            F.max("nb").alias("n_blocks"),
            F.sum("cj").alias("n_act"),
            F.sum(F.col("cj") * F.col("cj")).alias("sum_cj2"),
            F.sum("p_rb2").alias("sum_rb2"),
        )
        .filter(F.col("n_blocks") >= int(min_blocks))
    )
    num = F.lit(K - 1) * (
        F.lit(K) * F.col("sum_cj2") - F.col("n_act") * F.col("n_act")
    )
    den = F.lit(K) * F.col("n_act") - F.col("sum_rb2")
    q = F.when(
        den > 0,
        F.round(num.cast("double") / den.cast("double"), 6) + F.lit(0.0),
    )
    return agg.select(
        "key",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("n_act").cast("long").alias("n_act"),
        F.col("sum_cj2").cast("long").alias("sum_cj2"),
        F.col("sum_rb2").cast("long").alias("sum_rb2"),
        q.alias("q_stat"),
    )


def mcnemar_ampm(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 8,
) -> DataFrame:
    """Per-key McNemar test of morning/evening activity marginal
    homogeneity over observed days (paired within-day design).

    Returns (key, n_days, b_am, c_pm, mcnemar): observed-day count,
    the morning-only and evening-only day counts, and (b-c)^2/(b+c)
    (round 6; NULL when no day is discordant). Keys with fewer than
    ``min_days`` observed days drop."""
    half = (floordiv(epoch_us(ts), DAY_US // 2) % 2).alias("pm")
    daily = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), DAY_US).alias("d"),
            half,
        )
        .groupBy("key", "d")
        .agg(
            F.max((F.col("pm") == 0).cast("int")).alias("x_am"),
            F.max((F.col("pm") == 1).cast("int")).alias("y_pm"),
        )
    )
    agg = (
        daily.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(((F.col("x_am") == 1) & (F.col("y_pm") == 0)).cast("long"))
            .alias("b_am"),
            F.sum(((F.col("x_am") == 0) & (F.col("y_pm") == 1)).cast("long"))
            .alias("c_pm"),
        )
        .filter(F.col("n_days") >= int(min_days))
    )
    bc = F.col("b_am") + F.col("c_pm")
    d = (F.col("b_am") - F.col("c_pm")).cast("double")
    stat = F.when(bc > 0, F.round(d * d / bc.cast("double"), 6) + F.lit(0.0))
    return agg.select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        "b_am",
        "c_pm",
        stat.alias("mcnemar"),
    )
