"""GEV shape estimate from weekly block maxima per key, via
probability-weighted moments (Hosking, Wallis & Wood, Technometrics
1985 — public formulas). Completes the EVT quartet: hill_tail and
gpd_pot look at threshold exceedances, extremal_index at clustering;
the block-maxima route asks what law the WEEKLY PEAK follows — the
classical return-level question (what does the worst week of the
year look like) asked of any load/latency/value series.

Per key the cents-lattice block maxima m_(1) <= ... <= m_(n) over
observed 7-day UTC blocks give the exact rank-weighted sums

    B0 = sum m_(j)                       (exact)
    B1 = sum (j-1) m_(j)                 (exact, decimal acc)
    B2 = sum (j-1)(j-2) m_(j)            (exact, decimal acc)

and the PWM shape pipeline clears every division until one ratio:

    A = 2(n-2) B1 - (n-1)(n-2) B0        (= const * (2b1 - b0))
    B = 3 B2 - (n-1)(n-2) B0             (= const * (3b2 - b0))
    c = A/B - log2/log3
    kappa = 7.8590 c + 2.9554 c^2        (Hosking's approximation)

kappa > 0 is a bounded (Weibull) weekly-max tail, ~0 Gumbel,
< 0 heavy (Frechet). log2/log3 is carried as the literal double
0.6309297535714574 (embedded identically in the oracle) so NO
engine transcendental is ever called — the one ulp-divergent step a
cross-engine gamma/log would introduce is designed out; location
and scale need Gamma(1+kappa) and are deliberately left to driver-
side post-processing (jobs can apply Lanczos on the emitted exact
surface; an in-query Gamma would break byte parity, the bh_fdr exp()
lesson). A, B, B0 are emitted as BIGINT — exact below ~1e3 blocks
per key x max |cents| 1e9 (decade-scale weekly blocks are <= 522
rows, so the bound is structural, not hopeful).

Ties: within a block, max is order-free; across blocks the ascending
rank breaks ties by (cents, block) — tied maxima contribute
rank-span-invariant sums (the gpd_pot argument), so the statistic is
tie-stable.

Plan shape (100 TB): one scan -> hash agg to (key, block) maxima
(map-side combine does the heavy lifting) -> one (key)-window rank
over the <=522-row weekly lattice -> one hash agg. No joins, no
Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

DEC = "decimal(38,0)"
LOG2_OVER_LOG3 = 0.6309297535714574
WEEK_US = 7 * 86_400_000_000


def gev_shape(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_blocks: int = 20,
    block_us: int = WEEK_US,
) -> DataFrame:
    """Per-key GEV shape from block maxima over fixed ``block_us``
    UTC blocks (weekly by default; daily for month-span inputs).
    Returns (key, n_blocks, b0, b1, b2, gev_shape); keys with fewer
    than ``min_blocks`` observed blocks drop (three PWMs need
    n >= 3; the default keeps the small-sample bias bounded)."""
    mb = max(int(min_blocks), 3)
    bu = int(block_us)
    cents = F.round(F.col(value) * 100).cast("long")
    blocks = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), bu).alias("wk"),
            cents.alias("c"),
        )
        .groupBy("key", "wk")
        .agg(F.max("c").alias("m"))
    )
    w = Window.partitionBy("key").orderBy("m", "wk")
    ranked = blocks.withColumn("j", F.row_number().over(w))
    agg = (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.col("m").cast(DEC)).alias("_b0"),
            F.sum(
                ((F.col("j") - 1).cast("decimal(19,0)") * F.col("m")).cast(
                    DEC
                )
            ).alias("_b1"),
            F.sum(
                (
                    (F.col("j") - 1).cast("decimal(19,0)")
                    * (F.col("j") - 2)
                    * F.col("m")
                ).cast(DEC)
            ).alias("_b2"),
        )
        .filter(F.col("n_blocks") >= mb)
    )
    n = F.col("n_blocks").cast(DEC)
    a_num = (
        F.lit(2).cast(DEC) * (n - 2) * F.col("_b1")
        - (n - 1) * (n - 2) * F.col("_b0")
    )
    b_num = F.lit(3).cast(DEC) * F.col("_b2") - (n - 1) * (n - 2) * F.col(
        "_b0"
    )
    c = a_num.cast("double") / b_num.cast("double") - F.lit(
        LOG2_OVER_LOG3
    )
    kappa = F.when(
        b_num != 0,
        F.round(F.lit(7.8590) * c + F.lit(2.9554) * c * c, 6)
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        "n_blocks",
        F.col("_b0").cast("long").alias("b0"),
        F.col("_b1").cast("long").alias("b1"),
        F.col("_b2").cast("long").alias("b2"),
        kappa.alias("gev_shape"),
    )
