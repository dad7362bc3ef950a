"""OLAP-surface operators: cube aggregation, running-record extraction,
volume-weighted average price.

Three small families a warehouse user of the reference would expect
from the engine's SQL surface, each designed for hash-exact oracle
parity:

 - :func:`cube_profile` — Spark ``cube()`` (= SQL GROUPING SETS over
   all subsets) with exact counts + integer-cent sums; one expand +
   one exchange, partial+final all the way.
 - :func:`record_highs` — per-key record-breaking events (value above
   every prior value in (ts, value) order): pure copies and exact
   integer gaps, zero quantization.
 - :func:`vwap` — per-(group, calendar bucket) volume-weighted average
   price from exact integer cent*qty sums, plus the cumulative VWAP
   per group (window over the bucket aggregate, bounded by buckets per
   group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

ALL = "<all>"


def cube_profile(
    df: DataFrame,
    dims: tuple[str, str] = ("event_type", "hr"),
    value: str = "value",
) -> DataFrame:
    """CUBE over two dimensions with (n, cents) measures.

    Dimension columns are emitted coalesced to '<all>' for the
    aggregated grouping-set rows (both engines render the same
    labels, so no grouping_id bit-order dependency). The value measure
    is summed as exact integer cents.
    """
    d1, d2 = dims
    cents = F.round(F.col(value) * 100, 0).cast("long")
    return (
        df.select(
            F.col(d1).cast("string").alias("_d1"),
            F.col(d2).cast("string").alias("_d2"),
            cents.alias("_c"),
        )
        .cube("_d1", "_d2")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_c").alias("cents"))
        .select(
            F.coalesce("_d1", F.lit(ALL)).alias(d1),
            F.coalesce("_d2", F.lit(ALL)).alias(d2),
            "n",
            "cents",
        )
    )


def record_highs(
    df: DataFrame, key: str = "key", ts: str = "ts", value: str = "value"
) -> DataFrame:
    """Rows that set a new per-key running maximum, with the record
    index and the exact integer-microsecond gap since the previous
    record. Order (and tie-break) is (ts, value); the first row of a
    key is record 1. Every output is a copied value or exact integer —
    bit-exact across engines by construction."""
    w_prev = (
        Window.partitionBy(key)
        .orderBy(ts, value)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    recs = (
        df.where(F.col(value).isNotNull())
        .withColumn("_pm", F.max(value).over(w_prev))
        .where(F.col("_pm").isNull() | (F.col(value) > F.col("_pm")))
    )
    w_rec = Window.partitionBy(key).orderBy(ts, value)
    return recs.select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        F.col(value).alias("value"),
        F.row_number().over(w_rec).alias("record_idx"),
        (epoch_us(ts) - F.lag(epoch_us(ts)).over(w_rec)).alias("us_since_prev"),
    )


def vwap(
    df: DataFrame,
    group: str,
    ts: str,
    price: str,
    qty: str,
    unit: str = "month",
) -> DataFrame:
    """(group, bucket_ts, n, qty_sum, vwap, cum_vwap) — VWAP per
    calendar bucket plus the cumulative (running) VWAP per group.

    Exactness: price is summed as integer cents weighted by integer
    quantity, so both engines divide the same exact integers; the
    running sums are window aggregates over the bucket table (bounded
    by buckets per group, not rows)."""
    cents = F.round(F.col(price) * 100, 0).cast("long")
    q = F.round(F.col(qty), 0).cast("long")
    agg = (
        df.select(
            F.col(group).alias("grp"),
            F.date_trunc(unit, F.col(ts)).alias("bucket_ts"),
            (cents * q).alias("_cq"),
            q.alias("_q"),
        )
        .groupBy("grp", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_cq").alias("_scq"),
            F.sum("_q").alias("qty_sum"),
        )
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col("_scq").cast("double") / (F.lit(100.0) * F.col("qty_sum").cast("double"))
    cum = F.sum("_scq").over(w_cum).cast("double") / (
        F.lit(100.0) * F.sum("qty_sum").over(w_cum).cast("double")
    )
    return agg.select(
        "grp", "bucket_ts", "n", "qty_sum", v.alias("vwap"), cum.alias("cum_vwap")
    )
