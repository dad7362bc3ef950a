"""Rolling-window diagnostics: Bollinger bands and robust (median/IQR)
outlier bands.

Trailing count-window statistics per series — the monitoring staple
(is the latest observation outside its recent band?). Pure framed
window aggregates over one hash partition by key: Catalyst keeps the
whole computation in a single Window operator per frame spec, no UDFs,
no second shuffle. The frame is ordered by (ts, value) so duplicate
timestamps stay deterministic.

The robust variant uses exact `percentile` as a FRAMED window
aggregate (supported since Spark 3.1; DuckDB's `quantile_cont` is the
bit-compatible twin — both interpolate a + (b-a)*frac), trading the
Bollinger bands' Gaussian assumption for median ± k*IQR, which a
single spike cannot inflate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _frame(key: str, ts: str, value: str, n: int):
    return (
        Window.partitionBy(key)
        .orderBy(ts, value)
        .rowsBetween(-(n - 1), Window.currentRow)
    )


def bollinger(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    n: int = 20,
    k: float = 2.0,
) -> DataFrame:
    """Trailing-``n`` mean/stddev band per row: mean ± k*std and
    whether the row breaches it. Warm-up rows (frame of 1) have NULL
    std/bands and ``breach`` NULL — emitted, not dropped, so callers
    see the full series."""
    w = _frame(key, ts, value, n)
    mean = F.avg(value).over(w)
    std = F.stddev_samp(value).over(w)
    upper, lower = mean + k * std, mean - k * std
    return df.select(
        key, ts, value,
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        upper.alias("upper"),
        lower.alias("lower"),
        ((F.col(value) > upper) | (F.col(value) < lower)).alias("breach"),
    )


def robust_band(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    n: int = 20,
    k: float = 1.5,
) -> DataFrame:
    """Trailing-``n`` median and IQR per row, flagging rows with
    ``|value - median| > k * IQR`` (the Tukey fence on a sliding
    frame). IQR of a 1-row frame is 0, so warm-up rows are simply
    unflagged rather than NULL."""
    w = _frame(key, ts, value, n)
    med = F.expr(f"percentile({value}, 0.5)").over(w)
    iqr = (
        F.expr(f"percentile({value}, 0.75)").over(w)
        - F.expr(f"percentile({value}, 0.25)").over(w)
    )
    return df.select(
        key, ts, value,
        med.alias("roll_med"),
        iqr.alias("roll_iqr"),
        (F.abs(F.col(value) - med) > k * iqr).alias("outlier"),
    )


def drawdown(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Running peak and drawdown per series: peak = running max(value),
    drawdown = peak - value, plus the running maximum drawdown (the
    monitoring number "worst drop from a high so far").

    Two framed aggregates over the SAME window spec — Catalyst fuses
    them into one Window operator, one shuffle. dd_pct is NULL where
    the peak is 0 (division guard), not a NaN.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ts, value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max(value).over(w)
    dd = peak - F.col(value)
    out = df.select(
        key, ts, value,
        peak.alias("peak"),
        dd.alias("dd"),
        F.when(peak != 0, dd / peak).alias("dd_pct"),
    )
    w2 = (
        Window.partitionBy(key)
        .orderBy(ts, value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn("max_dd", F.max("dd").over(w2))


def rolling_corr(
    df: DataFrame,
    key: str = "key",
    ord_col: str = "ts",
    x: str = "x",
    y: str = "y",
    n: int = 30,
) -> DataFrame:
    """Trailing-``n`` Pearson correlation between two aligned columns.

    Built from framed SUMS with the explicit textbook algebra
    ``(n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))``
    instead of a native corr aggregate, so an oracle in another engine
    can evaluate the IDENTICAL operation tree (native window-corr
    implementations differ in accumulation scheme across engines).
    NULL (not NaN) when either variance term is non-positive (constant
    series in the frame, or a frame of one).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ord_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    cnt = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(F.col(x) * F.col(y)).over(w)
    sxx = F.sum(F.col(x) * F.col(x)).over(w)
    syy = F.sum(F.col(y) * F.col(y)).over(w)
    vx = cnt * sxx - sx * sx
    vy = cnt * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0),
        (cnt * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return df.select(
        key, ord_col, x, y,
        cnt.cast("long").alias("n_obs"),
        corr.alias("roll_corr"),
    )


def ulcer_index(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 20,
) -> DataFrame:
    """Ulcer index per key — drawdown-based risk (Martin & McCann,
    public formula): the RMS of percentage drawdowns from the running
    peak, the number that distinguishes "slow bleed under water" from
    the single worst drop max_dd reports.

    Exactness device: drawdowns are quantized to integer BASIS POINTS
    by floor division on the cents lattice, d_bp = (10^4*(P-c)) // P
    (P = running max — a copied value, exact), so the sum and sum of
    squares are exact integers (decimal(38,0) against partial-agg
    order) and the index is one sqrt of one division of exact ints.
    Rows before the first positive peak are excluded (0/0 guard),
    deterministically on both engines.

    Plan shape: the dedup aggregate, the running-max window and the
    final groupBy ride ONE hashpartitioning(key) exchange after the
    (key, us) dedup exchange — no join, no UDF.
    """
    from tits_spark.functions.exprs import epoch_us, floordiv

    mo = max(int(min_obs), 2)
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaked = ticks.select(
        "key", "c", F.max("c").over(w).alias("p")
    ).filter(F.col("p") > 0)
    d = peaked.select(
        "key",
        floordiv(F.lit(10_000) * (F.col("p") - F.col("c")), F.col("p"))
        .alias("d_bp"),
    )
    agg = (
        d.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("d_bp").alias("max_dd_bp"),
            F.sum(F.col("d_bp").cast("decimal(19,0)")).alias("sd"),
            F.sum(
                F.col("d_bp").cast("decimal(19,0)") * F.col("d_bp")
            ).alias("sd2"),
        )
        .filter(F.col("n_obs") >= mo)
    )
    n_d = F.col("n_obs").cast("double")
    return agg.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        "max_dd_bp",
        F.round(F.col("sd").cast("double") / n_d, 6).alias("avg_dd_bp"),
        F.round(F.sqrt(F.col("sd2").cast("double") / n_d), 6).alias(
            "ulcer_bp"
        ),
    )


def underwater_spells(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 20,
) -> DataFrame:
    """Underwater-spell durations per key — for HOW LONG does the
    series sit below its running peak? The TIME axis of drawdown risk:
    max_dd reports the worst depth and ulcer_index the RMS depth, but
    neither distinguishes a week under water from a year. A spell is a
    maximal run of consecutive ticks with c < running peak; its
    duration spans from the last at-peak tick to the recovery tick
    (NULL-extended to the key's last tick for a spell still open at
    end of history).

    Exactness: everything is an exact integer — cents with the house
    dup-timestamp rule, the running max is a copied value, spell ids
    come from the textbook gaps-and-islands device (row_number minus
    row_number over the below-flag), durations are int64 microsecond
    differences floor-divided to whole seconds.

    Plan shape (the 100 TB argument): the dedup aggregate, the running
    max, both row_number windows, the lead() recovery probe and the
    two stacked groupBys all ride ONE hashpartitioning(key) exchange
    — no join, no UDF.
    """
    from tits_spark.functions.exprs import epoch_us, floordiv

    mo = max(int(min_obs), 2)
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    wp = (
        Window.partitionBy("key")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("key").orderBy("us")
    wk = Window.partitionBy("key")
    flagged = ticks.select(
        "key",
        "us",
        (F.col("c") < F.max("c").over(wp)).cast("int").alias("below"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("n") >= mo)
    # gaps-and-islands: within a key, consecutive below-rows share
    # (rn_all - rn_below); the spell starts at the previous at-peak
    # tick and ends at the recovery tick (lead over the at-peak rows
    # would need a join — instead take the previous/next us via lag/
    # lead on the FULL tick order, exact because spells are maximal)
    marked = flagged.select(
        "key",
        "us",
        "below",
        "n",
        (
            F.row_number().over(wo)
            - F.row_number().over(
                Window.partitionBy("key", "below").orderBy("us")
            )
        ).alias("grp"),
        F.lag("us").over(wo).alias("prev_us"),
        F.lead("us").over(wo).alias("next_us"),
    ).filter(F.col("below") == 1)
    spells = marked.groupBy("key", "grp").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("ticks"),
        F.min(F.coalesce(F.col("prev_us"), F.col("us"))).alias("t0"),
        F.max(F.coalesce(F.col("next_us"), F.col("us"))).alias("t1"),
    )
    out = spells.groupBy("key").agg(
        F.max("n").cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("n_spells"),
        F.sum("ticks").cast("long").alias("below_ticks"),
        F.max("ticks").cast("long").alias("max_spell_ticks"),
        F.max(F.col("t1") - F.col("t0")).alias("max_spell_us"),
    )
    return out.select(
        "key",
        "n_obs",
        "n_spells",
        "below_ticks",
        "max_spell_ticks",
        floordiv(F.col("max_spell_us"), 1_000_000)
        .cast("long")
        .alias("max_spell_secs"),
    )
