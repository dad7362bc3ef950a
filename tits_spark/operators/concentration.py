"""Cross-sectional concentration per time bucket: the
Herfindahl-Hirschman index of per-key value totals.

ACROSS keys inside a time bucket, how concentrated is the bucket's
total on few keys?  HHI = Σ share² (Herfindahl 1950), plus the top-1
share and the effective number of contributors 1/HHI — the
cross-sectional transpose (cross_section.py's framing) of the per-key
inequality view (the `gini` query in __spark_entry__), and the
standard "is this hour one conversation or a thousand" triage
statistic for transcript telemetry.

Exactness device (the repo's standard): values live on the integer
cents lattice ``c = round(value*100)``; per-key bucket totals s_k and
Σ s_k² accumulate in decimal(38,0) (exact under any partial-agg
order), are emitted as BIGINT (bounds documented on the function),
and every emitted float is ONE fixed double expression over those
exact integers, mirrored verbatim in the DuckDB oracle, round-6 with
signed zero normalized.

Plan shape (the 100 TB argument): two partial+final hash aggregates —
(bucket, key) then (bucket) — two exchanges, no windows, no joins.  A
bucket's cross-section is an AGGREGATE, never a per-row window, so
there is no single-task bucket bottleneck at any key cardinality (the
trap cross_section.py documents for full in-bucket ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

_HOUR_US = 3_600_000_000


def hhi_per_bucket(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_us: int = _HOUR_US,
    min_keys: int = 2,
) -> DataFrame:
    """Herfindahl-Hirschman concentration of per-key value totals
    inside each time bucket (default hourly).

    Returns (bucket, n_keys, total_c, sumsq, top1_c, hhi, top1_share,
    eff_keys): the bucket index (epoch µs // bucket_us), contributor
    count, exact cent total, exact Σ s_k² over per-key totals, the
    largest per-key total (a copied exact value), and the three
    derived ratios rounded to 6dp — hhi = Σ(s_k/S)², the top
    contributor's share, and the effective contributor count 1/hhi.

    Only positive cents contribute (shares of a signed measure are
    undefined); buckets with fewer than ``min_keys`` contributors drop
    out.  total_c/sumsq are exact in decimal(38,0) and emitted as
    BIGINT: sumsq <= total_c², so the emission is exact while a
    bucket's cent total stays below ~3e9 dollars — far past any
    hourly bucket this engine targets; past that, widen the emission,
    the internal accumulation never wraps.
    """
    cents = F.round(F.col(value) * 100).cast("long")
    rows = df.select(
        floordiv(epoch_us(ts), int(bucket_us)).alias("bucket"),
        F.col(key).alias("key"),
        cents.alias("c"),
    ).filter(F.col("c") > 0)
    per_key = rows.groupBy("bucket", "key").agg(
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
    )
    return hhi_finalize(per_key, min_keys=min_keys)


def hhi_finalize(per_key: DataFrame, min_keys: int = 2) -> DataFrame:
    """Final HHI stage over a (bucket, key, s) frame of exact per-key
    decimal totals — factored out so the streaming twin
    (streaming/hhi_stream.py) reads its merged share deltas through
    the IDENTICAL expression tree and is bit-equal to batch by
    construction."""
    agg = (
        per_key.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("s").alias("total_c"),
            F.sum(F.col("s") * F.col("s")).alias("sumsq"),
            F.max("s").alias("top1_c"),
        )
        .filter(F.col("n_keys") >= int(min_keys))
    )
    tot = F.col("total_c").cast("double")
    ssq = F.col("sumsq").cast("double")
    return agg.select(
        "bucket",
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total_c").cast("long").alias("total_c"),
        F.col("sumsq").cast("long").alias("sumsq"),
        F.col("top1_c").cast("long").alias("top1_c"),
        (F.round(ssq / (tot * tot), 6) + F.lit(0.0)).alias("hhi"),
        (F.round(F.col("top1_c").cast("double") / tot, 6) + F.lit(0.0)).alias(
            "top1_share"
        ),
        (F.round(tot * tot / ssq, 6) + F.lit(0.0)).alias("eff_keys"),
    )
