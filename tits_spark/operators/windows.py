"""Window primitives mirroring the reference's stream-state ops.

 W1 sliding count-based window (ring buffer cap, ref:guess_lag.c:81,90-105)
 W2 first-difference               (ref:guess_lag.c:228-236)
 W3 time rebase to first ts        (ref:guess_lag.c:230-232,272)
 T1 best/argmax + generic top-k    (ref:guess_lag.c:286-304)

All are built-in window expressions — one shuffle on the partition key,
whole-stage codegen, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_last_n(
    df: DataFrame, keys: Sequence[str], ts: str, n: int
) -> DataFrame:
    """Keep the newest ``n`` rows per key — the batch analog of the
    reference's MAX_TICKS ring buffer (W1)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def first_diff(
    df: DataFrame, keys: Sequence[str], ts: str, value: str, out: str = "diff"
) -> DataFrame:
    """value[i] - value[i-1] per key in ts order; the first row per key
    is dropped (the reference emits a synthetic 0 it then never uses —
    we drop instead, documented deviation from ref:guess_lag.c:231-233)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    return (
        df.withColumn(out, F.col(value) - F.lag(value).over(w))
        .filter(F.col(out).isNotNull())
    )


def rebase_time(
    df: DataFrame, keys: Sequence[str], ts: str, out: str = "t_rel"
) -> DataFrame:
    """Seconds since the first observation of each key (W3)."""
    from tits_spark.functions.exprs import ts_seconds

    w = Window.partitionBy(*keys)
    t = ts_seconds(ts)
    return df.withColumn(out, t - F.min(t).over(w))


def top_k(
    df: DataFrame, keys: Sequence[str], order_col: str, k: int, desc: bool = True
) -> DataFrame:
    """Generic per-key top-k via ranking window."""
    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*keys).orderBy(oc)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def best_by(
    df: DataFrame, keys: Sequence[str], value_col: str, order_col: str
) -> DataFrame:
    """Per-key argmax: value of ``value_col`` at the max of ``order_col``
    (T1, declarative max_by). NaNs in ``order_col`` are excluded first —
    Spark sorts NaN above all numbers, which would otherwise win the
    argmax; the reference instead propagates NaN only when *everything*
    is NaN (ref:guess_lag.c:297-299), which this reproduces via the
    left join back onto the full key set."""
    clean = df.filter(~F.isnan(F.col(order_col)))
    agg = clean.groupBy(*keys).agg(
        F.max_by(value_col, order_col).alias(f"best_{value_col}"),
        F.max(order_col).alias(f"best_{order_col}"),
    )
    allkeys = df.select(*keys).distinct()
    return allkeys.join(agg, list(keys), "left")
