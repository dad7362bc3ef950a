"""All-pairs Pearson correlation across series, aligned on time buckets.

The cross-series diagnostic ("which conversations/hosts/symbols move
together") the single-pair rolling_corr cannot give. Plan shape:

 1. one hash agg -> per-(key, bucket) activity totals;
 2. a self EQUI-join on the bucket — each bucket contributes
    (keys active in it choose 2) pairs, so the blowup is per-bucket
    key count squared, NOT total keys squared; callers with millions
    of simultaneously-active keys should pre-filter to a cohort;
 3. one hash agg on (key_a, key_b) -> moment sums -> closed-form r.

Exactness discipline (cross-engine): Pearson r is invariant under
positive scaling, so the bucket totals are carried as exact integers
(value * scale, rint'ed — exact when input values live on a 1/scale
lattice, e.g. 2-decimal values with scale=100). Every moment sum is
then an exact integer; products are computed in DECIMAL(38,0) (Spark)
/ HUGEINT (DuckDB) so nothing overflows at any realistic bucket count,
and the single float division + sqrt at the end is the same IEEE op on
identical inputs. Zero-variance sides are an EXACT integer test
(d == 0), not a float threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.rollup import bucket_col


def corr_matrix(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    tier: str = "1h",
    min_buckets: int = 8,
    scale: int = 100,
) -> DataFrame:
    """(key_a, key_b, n_buckets, r) for every key pair sharing >=
    ``min_buckets`` active buckets (key_a < key_b; pairs with a
    zero-variance side are dropped — r undefined)."""
    cells = (
        df.groupBy(F.col(key).alias("k"), bucket_col(ts, tier).alias("b"))
        .agg(
            F.round(F.sum(value) * scale, 0).cast("long").alias("x")
        )
    )
    a = cells.select(F.col("k").alias("key_a"), "b", F.col("x").alias("xa"))
    bb = cells.select(F.col("k").alias("key_b"), "b", F.col("x").alias("xb"))
    joined = a.join(bb, "b").filter(F.col("key_a") < F.col("key_b"))
    # all moment arithmetic in DECIMAL(38,0): exact integer sums and
    # products at any realistic bucket count (the HUGEINT analog on
    # the DuckDB side) — a long would overflow past ~1e18
    da, db = F.col("xa").cast("decimal(38,0)"), F.col("xb").cast("decimal(38,0)")
    agg = joined.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(da).alias("sa"),
        F.sum(db).alias("sb"),
        F.sum(da * db).alias("sab"),
        F.sum(da * da).alias("saa"),
        F.sum(db * db).alias("sbb"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    n = dec("n_buckets")
    num = n * dec("sab") - dec("sa") * dec("sb")
    d1 = n * dec("saa") - dec("sa") * dec("sa")
    d2 = n * dec("sbb") - dec("sb") * dec("sb")
    return (
        agg.filter(F.col("n_buckets") >= min_buckets)
        .withColumn("_num", num)
        .withColumn("_d1", d1)
        .withColumn("_d2", d2)
        .filter((F.col("_d1") > 0) & (F.col("_d2") > 0))
        .select(
            "key_a",
            "key_b",
            "n_buckets",
            F.round(
                F.col("_num").cast("double")
                / F.sqrt(F.col("_d1").cast("double") * F.col("_d2").cast("double")),
                6,
            ).alias("r"),
        )
    )
