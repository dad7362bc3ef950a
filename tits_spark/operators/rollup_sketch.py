"""Sketch-bearing rollup tiers: mergeable distinct counts per bucket.

The rollup cascade (operators/rollup.py) keeps only associative
aggregates so coarser tiers derive from finer ones without re-reading
raw. Distinct counts are NOT associative — but their HLL register
tables are (register-wise max), which is exactly how TimescaleDB's
continuous aggregates and Druid carry approx-distinct through rollups.
This module adds that column family to the tier cascade:

 - :func:`distinct_registers` — raw stream -> per-bucket register
   table, one hash-aggregate shuffle whose exchange carries at most
   ``buckets x 2^p`` rows after map-side partial max (never the items);
 - :func:`registers_cascade` — finer tier's registers -> coarser
   tier's, a pure groupBy-max over the ~60x smaller register table.
   Because max is associative, the cascaded table is EXACTLY the table
   a direct raw scan would produce (property-tested), so estimates at
   every tier are identical either way — the resume/checkpoint story of
   rollup.py applies unchanged to the sketch column family;
 - estimation reuses :func:`sketches.hll_estimate` (integer-scaled
   harmonic sum -> deterministic under any partitioning, DuckDB can
   re-derive every register from the md5 hash family).

At 10^12 turns: "distinct active conversations per hour/day" touches
raw once (the 1m pass), and every coarser tier is a sketch-only job.

Retention interaction: unlike the rollup cascade (whose 1h/1d tiers
are STORED), sketch coarser tiers derive at read time — so before
expiring hll_1m/hist_1m day-partitions under a TTL
(operators/retention.py accepts sketch tier names in ttl_days),
materialize the coarser cascade first (``registers_cascade(...,
"1d")`` written as its own tier). The cascade is exact, so expiring
the fine tier afterwards loses nothing the coarse view needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.rollup import TIERS, bucket_col
from tits_spark.operators.sketches import H_BITS, h60, hll_estimate


def distinct_registers(
    df: DataFrame,
    ts: str = "ts",
    item: Column | str = "key",
    tier: str = "1m",
    p: int = 8,
) -> DataFrame:
    """(bucket_ts, reg, rho): HLL register table per time bucket.

    register = low ``p`` hash bits, rho = 1 + leading zeros of the
    rest — identical derivation to sketches.hll_registers, keyed by the
    tier bucket instead of a categorical group.
    """
    m = 1 << p
    wmax = H_BITS - p + 1
    it = F.col(item) if isinstance(item, str) else item
    h = h60(it)
    rest = F.shiftright(h, p)
    rho = (
        F.when(rest == 0, F.lit(wmax))
        .otherwise(F.lit(wmax) - F.length(F.bin(rest)))
        .cast("int")
    )
    return (
        df.where(it.isNotNull())
        .select(
            bucket_col(ts, tier).alias("bucket_ts"),
            h.bitwiseAND(m - 1).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("bucket_ts", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def registers_cascade(regs: DataFrame, to_tier: str) -> DataFrame:
    """Merge a finer tier's register table into a coarser tier's —
    register-wise max after re-truncating the bucket. Exact: equals
    :func:`distinct_registers` run directly on raw at ``to_tier``."""
    if to_tier not in TIERS:
        raise ValueError(f"unknown tier {to_tier!r}")
    return (
        regs.groupBy(
            bucket_col("bucket_ts", to_tier).alias("bucket_ts"), "reg"
        )
        .agg(F.max("rho").alias("rho"))
    )


def distinct_by_bucket(regs: DataFrame, p: int = 8) -> DataFrame:
    """(bucket_ts, zeros, sum_scaled, hll_est) per bucket."""
    return hll_estimate(regs, p, group_cols=("bucket_ts",))
