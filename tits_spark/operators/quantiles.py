"""Histogram quantiles: exact type-1 quantiles over a value lattice.

Spark's ``percentile`` (and the percentiles query) buffers every value
of a group in executor memory — fine per-conversation, an OOM hazard
for planet-sized groups ("p99 across ALL turns"). This operator is the
mergeable form: quantize values to a fixed lattice (``scale`` steps
per unit; exact when the data already sits on such a lattice, e.g.
2-decimal prices/lengths), reduce to a (key, lattice-point) -> count
histogram with map-side partial aggregation, then read quantiles off
the cumulative histogram. The shuffle and the per-key sort touch only
the COMPRESSED histogram (distinct lattice points), never the rows,
and histograms merge by adding counts — the same continuous-aggregate
property as the rollup tiers and HLL registers (operators/
rollup_sketch.py).

Quantile definition: type-1 (inverted ECDF) — the p-quantile is the
smallest lattice value whose cumulative count reaches ceil(p * n).
Rank arithmetic is integer after one shared IEEE multiply, so Spark
and any SQL engine agree bit-for-bit (no interpolation floats).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_probs(probs: Sequence[float]) -> None:
    for p in probs:
        if not (0.0 < p <= 1.0) or round(p * 100) != p * 100:
            raise ValueError(f"probs must be 2-decimal fractions in (0,1]: {p}")


def value_histogram(
    df: DataFrame,
    keys: Sequence[str],
    value: str = "value",
    scale: int = 100,
) -> DataFrame:
    """(keys..., q, cnt): the lattice histogram — the tier-table form.

    Histograms MERGE BY ADDING COUNTS, so this is a continuous-
    aggregate column family like rollup.py's sums and rollup_sketch's
    HLL registers: build once at the finest tier, derive coarser tiers
    with :func:`hist_cascade`, read quantiles at any tier with
    :func:`quantiles_from_hist` — raw is scanned exactly once.
    """
    q = F.round(F.col(value) * scale).cast("long")
    return (
        df.where(F.col(value).isNotNull())
        .groupBy(*keys, q.alias("q"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_cascade(hist: DataFrame, bucket: str, to_tier: str) -> DataFrame:
    """Merge a finer tier's histograms into a coarser tier's by
    re-truncating the bucket column and summing counts — exact (integer
    addition is associative), same contract as rollup_sketch's
    registers_cascade."""
    from tits_spark.operators.rollup import bucket_col

    others = [c for c in hist.columns if c not in (bucket, "q", "cnt")]
    return (
        hist.groupBy(
            bucket_col(bucket, to_tier).alias(bucket), *others, "q"
        )
        .agg(F.sum("cnt").alias("cnt"))
    )


def quantiles_from_hist(
    hist: DataFrame,
    keys: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    scale: int = 100,
) -> DataFrame:
    """Read type-1 quantiles off a (keys..., q, cnt) histogram."""
    _check_probs(probs)
    keys = list(keys)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    aggs = [F.max("n").alias("n")]
    for p in probs:
        rank = F.ceil(F.lit(p) * F.col("n"))
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= rank, F.col("q"))) / scale
            ).alias(f"q_p{round(p * 100)}")
        )
    return cum.groupBy(*keys).agg(*aggs)


def hist_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str = "value",
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    scale: int = 100,
) -> DataFrame:
    """(keys..., n, q_p{...}): exact type-1 quantiles of the quantized
    values. Column ``q_p50`` holds the 0.5-quantile etc. (prob * 100 —
    probs are validated to 2dp so names cannot collide)."""
    _check_probs(probs)
    hist = value_histogram(df, keys, value, scale)
    return quantiles_from_hist(hist, keys, probs, scale)


def hist_quantiles_sql(
    table: str,
    keys: Sequence[str],
    value: str = "value",
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    scale: int = 100,
) -> str:
    """DuckDB twin generated from the same prob/scale constants."""
    ks = ", ".join(keys)
    picks = ",\n       ".join(
        f"min(CASE WHEN cum >= ceil({p} * n) THEN q END) / {scale} "
        f"AS q_p{round(p * 100)}"
        for p in probs
    )
    return f"""
WITH hist AS (
  SELECT {ks}, CAST(round({value} * {scale}) AS BIGINT) AS q,
         count(*) AS cnt
  FROM {table} WHERE {value} IS NOT NULL
  GROUP BY ALL
),
c AS (
  SELECT {ks}, q, cnt,
         sum(cnt) OVER (PARTITION BY {ks} ORDER BY q
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY {ks}) AS n
  FROM hist
)
SELECT {ks}, CAST(max(n) AS BIGINT) AS n,
       {picks}
FROM c GROUP BY {ks}
"""
