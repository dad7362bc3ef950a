"""Nonparametric randomness screens per key: the turning-points test
and the Cox-Stuart sign-trend test.

The zero-assumption FRONT GATE of the diagnostics suite: before
fitting AR (correlate.py), GARCH (garch.py) or a trend (theilsen.py),
a 10^12-turn pipeline first asks "is this key distinguishable from
noise at all?". Both tests are classical, distribution-free and
integer-exact (Kendall & Stuart; Cox & Stuart 1955, public formulas):

* Turning points: count T of strict interior local extrema; under
  i.i.d. exchangeability E[T] = 2(n-2)/3, Var[T] = (16n - 29)/90.
  Too few turns means trend/persistence, too many means negative
  autocorrelation (oscillation).
* Cox-Stuart: pair x_i with x_{i+h}, h = n//2 (middle observation
  dropped when n is odd), count positive differences among the m
  non-tied pairs; under no-trend n_plus ~ Binomial(m, 1/2).

Exactness: cents with the house dup-timestamp rule make every count
exact int64; ties are handled by the STRICT inequalities both tests
specify (a tie is neither a turn nor a signed pair) — deterministic
on both engines, no tolerance anywhere. The z-scores are one fixed
double tree over exact integers, rounded at 6dp.

Plan shape (the 100 TB argument): turning_points is the bns_jumps
plan — dedup aggregate, two window lags, one groupBy, all on ONE
hashpartitioning(key) exchange, no join, no UDF. cox_stuart avoids
the tempting self-join on (key, i+h) with a fold device: row i maps
to pair slot j (= i in the first half, i - (n-h) in the second), and
a groupBy (key, j) pivots the two halves into one row — key-prefixed
grouping keys keep every step on the key partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def _ticks(df: DataFrame, key: str, ts: str, value: str) -> DataFrame:
    return (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )


def turning_points(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key turning-points randomness test.

    Returns (key, n_obs, n_turns, z): tick count, the exact count of
    strict interior extrema, and the normal z-score
    (T - 2(n-2)/3) / sqrt((16n-29)/90) rounded to 6dp. Keys shorter
    than ``min_obs`` ticks are dropped.
    """
    mo = max(int(min_obs), 3)
    ticks = _ticks(df, key, ts, value)
    wo = Window.partitionBy("key").orderBy("us")
    t = ticks.select(
        "key",
        F.lag("c").over(wo).alias("a"),
        F.col("c").alias("b"),
        F.lead("c").over(wo).alias("d"),
    )
    turn = (
        ((F.col("a") < F.col("b")) & (F.col("b") > F.col("d")))
        | ((F.col("a") > F.col("b")) & (F.col("b") < F.col("d")))
    ).cast("int")
    agg = (
        t.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.when(F.col("a").isNotNull(), turn)).alias("n_turns"),
        )
        .filter(F.col("n_obs") >= mo)
    )
    n = F.col("n_obs").cast("double")
    mu = F.lit(2.0) * (n - 2.0) / F.lit(3.0)
    var = (F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0)
    return agg.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_turns").cast("long").alias("n_turns"),
        F.round(
            (F.col("n_turns").cast("double") - mu) / F.sqrt(var), 6
        ).alias("z"),
    )


def cox_stuart(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key Cox-Stuart sign-trend test.

    Returns (key, n_obs, n_pairs, n_plus, z): tick count, non-tied
    pair count m, positive-difference count, and the binomial normal
    approximation z = (n_plus - m/2) / sqrt(m/4) rounded to 6dp (NULL
    when every pair ties). Keys shorter than ``min_obs`` are dropped.
    """
    mo = max(int(min_obs), 4)
    ticks = _ticks(df, key, ts, value)
    wo = Window.partitionBy("key").orderBy("us")
    wk = Window.partitionBy("key")
    idx = ticks.select(
        "key",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wk).alias("n"),
        "c",
    ).filter(F.col("n") >= mo)
    h = F.floor(F.col("n") / 2)
    # first half: i <= h -> slot i, side 1; second half: i > n - h ->
    # slot i - (n - h), side 2; odd-n middle row maps to neither
    slotted = idx.select(
        "key",
        "n",
        F.when(F.col("i") <= h, F.col("i"))
        .when(F.col("i") > F.col("n") - h, F.col("i") - (F.col("n") - h))
        .alias("j"),
        F.when(F.col("i") <= h, F.lit(1)).otherwise(F.lit(2)).alias(
            "side"
        ),
        "c",
    ).filter(F.col("j").isNotNull())
    pairs = slotted.groupBy("key", "j").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("side") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("side") == 2, F.col("c"))).alias("c2"),
    )
    agg = pairs.groupBy("key").agg(
        F.max("n").alias("n_obs"),
        F.sum((F.col("c2") != F.col("c1")).cast("long")).alias("m"),
        F.sum((F.col("c2") > F.col("c1")).cast("long")).alias("n_plus"),
    )
    m = F.col("m").cast("double")
    z = F.when(
        F.col("m") > 0,
        F.round(
            (F.col("n_plus").cast("double") - m / 2.0)
            / F.sqrt(m / 4.0),
            6,
        ),
    )
    return agg.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("m").cast("long").alias("n_pairs"),
        F.col("n_plus").cast("long").alias("n_plus"),
        z.alias("z"),
    )
