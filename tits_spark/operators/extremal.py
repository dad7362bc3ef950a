"""Extremal index of an irregular event series — do threshold
exceedances arrive independently or in CLUSTERS?

Ferro & Segers (JRSS-B 2003, public formula): with exceedance times
t_1 < ... < t_N of a high threshold and inter-exceedance times
T_i = t_{i+1} - t_i,

    theta_hat = min(1, 2 * (sum T_i)^2 / ((N-1) * sum T_i^2))

theta ~ 1 means exceedances are scattered (independent-like); theta
near 1/m means they arrive in clusters of mean size m — the
difference between "p999 spikes are isolated" and "p999 spikes come
in bursts", which decides alerting debounce and capacity headroom.
The companion of hill_tail (HOW heavy is the tail) and bursts (WHERE
the hot intervals are): this is the tail's CLUSTERING coefficient.

Exactness: the threshold is an order statistic on the cents lattice
(a copied data value — rank arithmetic only, bit-identical
cross-engine; exactly the winsorized_stats argument, robust.py). The
top-k membership is made deterministic under cent ties by ranking on
(c DESC, us ASC). Gaps are floor-divided to whole SECONDS so both
moment sums are exact int64 for any span below ~90 years
(sum T <= span < 3e9 s, sum T^2 <= span^2 < 2^63), and int64 ->
double conversion is IEEE-correctly-rounded on every engine, so
theta is ONE fixed double tree over exact integers.

Plan shape (the 100 TB argument): one window shuffle per key (rank by
value desc — hill_tail's top-k shape) prunes to k rows per key BEFORE
the gap window and the aggregate, so downstream cost is k x n_keys
regardless of input size; the gap lag() rides the same key
partitioning. No join anywhere except the implicit window chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def extremal_index(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    k: int = 30,
) -> DataFrame:
    """Per-key Ferro–Segers extremal index over the k largest values.

    Returns (key, n_exc, u_cents, sum_t, sum_t2, theta): the
    exceedance count (= k; smaller keys drop out), the threshold in
    cents (the smallest exceedance — exact int64), the two exact
    gap-moment sums in whole seconds, and theta rounded to 6dp (NULL
    when every gap is zero). theta <= 2/(N-1) floor never triggers a
    divide-by-zero: the N >= 2 gap requirement is implied by k >= 2.
    """
    kk = int(k)
    if kk < 3:
        raise ValueError("extremal_index needs k >= 3 (N-1 >= 2 gaps)")
    cents = F.round(F.col(value) * 100).cast("long")
    rows = df.select(
        F.col(key).alias("key"), epoch_us(ts).alias("us"), cents.alias("c")
    )
    w = Window.partitionBy("key").orderBy(F.desc("c"), F.asc("us"))
    exc = rows.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= kk
    )
    wt = Window.partitionBy("key").orderBy("us")
    gaps = exc.select(
        "key",
        "c",
        floordiv(F.col("us") - F.lag("us").over(wt), 1_000_000).alias("t"),
    )
    agg = (
        gaps.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_exc"),
            F.min("c").alias("u_cents"),
            F.sum("t").alias("sum_t"),
            F.sum(F.col("t") * F.col("t")).alias("sum_t2"),
        )
        .filter(F.col("n_exc") == kk)
    )
    st = F.col("sum_t").cast("double")
    st2 = F.col("sum_t2").cast("double")
    theta = F.when(
        F.col("sum_t2") > 0,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0) * st * st / ((kk - 1) * st2),
            ),
            6,
        ),
    )
    return agg.select(
        "key",
        F.col("n_exc").cast("long").alias("n_exc"),
        "u_cents",
        "sum_t",
        "sum_t2",
        theta.alias("theta"),
    )
