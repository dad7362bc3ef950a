"""Per-key ordinary-least-squares trend over time, exact-integer
moments formulation.

The engine's robust trend (operators/trend.py, Theil-Sen) answers
"is it drifting" outlier-safely; this is its classical complement:
slope/intercept/R² per key, the summary a dashboard fits over every
rolled-up series. Spark-first: ONE partial+final hash aggregate.

Exactness device: time is rebased per key to integer SECONDS from the
key's first sample (t - t0), values to integer cents — so Σt, Σv,
Σt², Σv², Σtv are all exact BIGINTs (DuckDB: HUGEINT) for any
realistic key (t-span <= ~68 years, |cents| <= ~3e4, n <= ~1e6), and
slope/intercept/R² are fixed double expressions over exact integers,
written identically in the oracle — bit-for-bit, no quantization.

The rebase needs min(ts) per key before the moment sums; both run in
the same aggregate pass via a self-join-free two-stage groupBy: first
min_ts per key (tiny), broadcast back. At 10^12 rows the broadcast of
|keys| min-timestamps is the only extra cost and the scan stays one
pass per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def ols_trend(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 3,
) -> DataFrame:
    """(key, n, slope_per_sec, intercept, r2) per key.

    slope is in original value units per second; intercept is the
    fitted value at the key's FIRST sample time (t = 0 after rebase,
    cents / 100). Keys with fewer than ``min_points`` samples, zero
    time spread, or zero value variance are dropped (no finite fit).
    """
    prep = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("_us"),
        F.round(F.col(value) * 100, 0).cast("long").alias("_c"),
    )
    t0 = prep.groupBy("key").agg(F.min("_us").alias("_us0"))
    based = prep.join(F.broadcast(t0), "key").select(
        "key",
        ((F.col("_us") - F.col("_us0")) / F.lit(1_000_000)).cast("long").alias("_t"),
        "_c",
    )
    agg = based.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_t").alias("st"),
        F.sum("_c").alias("sv"),
        # second-order sums in decimal(38,0): t^2 <= 1e15 (a 68-year
        # span) times 1e6+ rows/key would wrap int64 silently
        F.sum((F.col("_t") * F.col("_t")).cast("decimal(38,0)")).alias("stt"),
        F.sum((F.col("_c") * F.col("_c")).cast("decimal(38,0)")).alias("svv"),
        F.sum((F.col("_t") * F.col("_c")).cast("decimal(38,0)")).alias("stv"),
    )
    nn = F.col("n").cast("double")
    st = F.col("st").cast("double")
    sv = F.col("sv").cast("double")
    stt = F.col("stt").cast("double")
    svv = F.col("svv").cast("double")
    stv = F.col("stv").cast("double")
    num = nn * stv - st * sv
    dent = nn * stt - st * st
    denv = nn * svv - sv * sv
    slope = num / dent
    intercept = (sv - slope * st) / nn
    r2 = (num * num) / (dent * denv)
    return (
        agg.where(F.col("n") >= min_points)
        .withColumn("_dent", dent)
        .withColumn("_denv", denv)
        .where((F.col("_dent") > 0) & (F.col("_denv") > 0))
        .select(
            "key",
            "n",
            (slope / F.lit(100.0)).alias("slope_per_sec"),
            (intercept / F.lit(100.0)).alias("intercept"),
            r2.alias("r2"),
        )
    )
