"""Categorical mutual information per key: I(event_type ; hour-of-day).

MI over the joint count table (Shannon; the "does WHAT happen depend
on WHEN" screen — 0 iff the key's event mix is the same at every hour;
high values mean strongly scheduled behavior worth a seasonal model):

    I(U;V) = sum_{u,v} (n_uv / n) * ln(n_uv * n / (n_u * n_v))

Everything inside ln() is a ratio of exact integer counts, so each
cell's contribution n_uv * ln(n_uv * n / (n_u * n_v)) is the identical
double on every engine; the per-cell terms are quantized to the
floor-1e9 lattice BEFORE the per-key sum, so the aggregation is pure
BIGINT — partial-agg order cannot move the result (the same
quantize-then-sum discipline as the Allan cascade).

Plan: one shuffle for the joint counts, two window passes for the
marginals (co-partitioned on key — Spark reuses the exchange), one
hash agg. Output bounded by keys x |types| x 24.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_info_type_hour(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    cat_col: str = "event_type",
) -> DataFrame:
    """Per-key MI between ``cat_col`` and hour-of-day (UTC).

    Returns (key, n, n_cells, mi_u6) — mi in nats on the floor-1e6
    lattice (sum of per-cell floor-1e9 terms, then one division)."""
    joint = (
        df.select(
            F.col(key).alias("key"),
            F.col(cat_col).alias("u"),
            F.hour(F.col(ts).cast("timestamp")).alias("v"),
        )
        .groupBy("key", "u", "v")
        .agg(F.count(F.lit(1)).alias("nuv"))
    )
    wk = Window.partitionBy("key")
    wu = Window.partitionBy("key", "u")
    wv = Window.partitionBy("key", "v")
    cells = (
        joint.withColumn("n", F.sum("nuv").over(wk))
        .withColumn("nu", F.sum("nuv").over(wu))
        .withColumn("nv", F.sum("nuv").over(wv))
    )
    term = F.floor(
        F.col("nuv")
        * F.log(
            (F.col("nuv") * F.col("n")).cast("double")
            / (F.col("nu") * F.col("nv")).cast("double")
        )
        * 1e9
    ).cast("long")
    return (
        cells.select("key", "n", term.alias("q"))
        .groupBy("key")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("q").alias("_sq"),
        )
        .select(
            "key", "n", "n_cells",
            # sum_q / 1e9 / n * 1e6  ==  sum_q / (n * 1000)
            F.floor(F.col("_sq") / (F.col("n") * 1000.0)).cast("long").alias("mi_u6"),
        )
    )
