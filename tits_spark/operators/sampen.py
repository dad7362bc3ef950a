"""Sample entropy (Richman & Moorman 2000) of the daily activity
series per key — how UNPREDICTABLE is a key's day-to-day event count?
The regularity complement of perm_entropy (ordinal patterns, blind to
magnitude) and iact (linear memory): SampEn counts recurring
magnitude templates, so a metronomic weekly routine scores near 0
while bursty, patternless activity scores high.

Series: the zero-filled complete-day spine of per-day event counts
(cochran/friedman's spine device — missing days ARE data here).
With integer counts x_1..x_n, tolerance r, and template pairs
i < j <= n-1:

    B = #{ |x_i - x_j| <= r }                         (m = 1 matches)
    A = #{ |x_i - x_j| <= r  and  |x_{i+1} - x_{j+1}| <= r }  (m = 2)

    sampen = -ln(A / B)       (NULL when A = 0 or B = 0)

Tolerance protocol: r = max(1, IQR/4) where the quartiles are COPIED
order statistics of the spine counts at integer ranks (k*n)//4 over
the (x, d) total order (var_backtest's device) — scale-adaptive like
the textbook 0.2*sigma but exact-integer and outlier-robust.

Exactness: x, r, A, B are exact int64; sampen is one ln of one
division, round 6.

Plan shape (100 TB): the raw stream collapses to the per-day count
spine FIRST (bounded by the key's day SPAN, not its row volume), the
quartile ranks ride one (key)-window chain, and the only join is the
spine's self-join on key with i < j — fan-out span^2/2 per key
(~2k pairs at 2 months, ~6.6M at a decade; past that re-bucket to the
weekly tier, the house retention escape hatch). No cartesian, no
Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def sample_entropy(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 20,
) -> DataFrame:
    """Per-key SampEn(m=1->2, r=max(1, IQR/4)) of daily event counts.

    Returns (key, n_days, r_tol, b_pairs, a_pairs, sampen); keys
    spanning fewer than ``min_days`` days drop."""
    md = max(int(min_days), 8)
    daily = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), 86_400_000_000).alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    # r06: daily feeds both the span spine and the grid join, and tmpl
    # feeds both template self-join sides — persist so the scan +
    # window chain runs once, not four times (guide §2.4; both frames
    # are |key x day|-bounded).
    daily = daily.persist()
    span = daily.groupBy("key").agg(
        F.min("d").alias("mn"), F.max("d").alias("mx")
    )
    spine = span.select(
        "key",
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("d"),
    )
    grid = spine.join(daily, ["key", "d"], "left").select(
        "key", "d", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
    )

    wk = Window.partitionBy("key")
    wr = Window.partitionBy("key").orderBy("x", "d")
    wo = Window.partitionBy("key").orderBy("d")
    ranked = grid.select(
        "key",
        "d",
        "x",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wk).alias("n"),
        F.lead("x").over(wo).alias("xn"),
        F.row_number().over(wo).alias("i"),
    ).filter(F.col("n") >= md)
    q = ranked.select(
        "key",
        "x",
        "xn",
        "i",
        "n",
        F.max(
            F.when(F.col("rk") == floordiv(F.col("n"), 4), F.col("x"))
        ).over(wk).alias("q1"),
        F.max(
            F.when(F.col("rk") == floordiv(F.lit(3) * F.col("n"), 4), F.col("x"))
        ).over(wk).alias("q3"),
    )
    tmpl = q.filter(F.col("xn").isNotNull()).select(
        "key",
        "i",
        "x",
        "xn",
        "n",
        F.greatest(
            F.lit(1), floordiv(F.col("q3") - F.col("q1"), 4)
        ).alias("r"),
    ).persist()
    lhs = tmpl.select(
        "key", "n", "r",
        F.col("i").alias("i1"), F.col("x").alias("x1"),
        F.col("xn").alias("s1"),
    )
    rhs = tmpl.select(
        "key",
        F.col("i").alias("i2"), F.col("x").alias("x2"),
        F.col("xn").alias("s2"),
    )
    pairs = lhs.join(rhs, "key").filter(F.col("i1") < F.col("i2"))
    b = F.abs(F.col("x1") - F.col("x2")) <= F.col("r")
    a = b & (F.abs(F.col("s1") - F.col("s2")) <= F.col("r"))
    agg = pairs.groupBy("key").agg(
        F.max("n").alias("n_days"),
        F.max("r").alias("r_tol"),
        F.sum(b.cast("long")).alias("b_pairs"),
        F.sum(a.cast("long")).alias("a_pairs"),
    )
    sampen = F.when(
        (F.col("a_pairs") > 0) & (F.col("b_pairs") > 0),
        F.round(
            -F.log(
                F.col("a_pairs").cast("double")
                / F.col("b_pairs").cast("double")
            ),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("r_tol").cast("long").alias("r_tol"),
        F.col("b_pairs").cast("long").alias("b_pairs"),
        F.col("a_pairs").cast("long").alias("a_pairs"),
        sampen.alias("sampen"),
    )
