"""Isotonic (monotone non-decreasing) regression of the hour-of-day
mean-value profile per key — the calibration-curve primitive (Ayer
et al. 1955; Barlow & Brunk 1972 — public minimax characterization):
fit(h) = max_{a<=h} min_{b>=h} avg(y[a..b]), which equals the PAVA
(pool-adjacent-violators) solution exactly. Monotone calibration is
the standard post-hoc fix for any score a curation pipeline
thresholds (quality scores, classifier logits binned by score
decile); here it runs on the bounded 24-level hour lattice, the same
shape a score-decile calibration would use.

Exactness: interval averages are carried as floor-micro-cent
quotients q(a,b) = (1e6 * sum cents[a..b]) DIV (sum n[a..b]) — and
because floor is monotone and commutes with min/max over a finite
set, max_a min_b of the FLOORED quotients equals the floor of the
true rational minimax, i.e. fit_micro = floor(1e6 * PAVA fit)
EXACTLY (no lattice-definition caveat needed; the brute-force
Fraction PAVA test asserts this identity). Everything emitted is
BIGINT — no float lives outside floordiv's exact-multiple device.

Exactness bound (floordiv's 2**53 contract): |1e6 * per-key cent
sum| < 2**53, i.e. the per-key absolute cent sum stays below ~9e9
(~$90M of turnover per key). Past that, drop the micro lattice one
decade; the construction is unchanged.

Plan shape (100 TB): one scan -> hash agg to the <=24-row hourly
lattice per key -> ONE bounded self-join on key (a.h <= b.h, <=300
pair rows per key) -> a (key, a)-window suffix-min -> a (key, h)
hash agg for the max. Every stage after the first agg runs on the
bounded lattice only; the raw table is touched once. No Python, no
global windows, no unbounded join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv


def isotonic_hourly(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key isotonic fit of the hourly mean profile. Returns
    (key, hour, n_obs, raw_micro, fit_micro): the hour's observed
    floor-micro-cent mean and its monotone (non-decreasing in hour)
    isotonic fit, both exact BIGINT micro-cents."""
    cents = F.round(F.col(value) * 100).cast("long")
    hourly = (
        df.select(
            F.col(key).alias("key"),
            F.hour(ts).alias("h"),
            cents.alias("c"),
        )
        .groupBy("key", "h")
        .agg(
            F.sum("c").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hourly.select(
        "key",
        "h",
        "s",
        "n",
        F.sum("s").over(wcum).alias("cs"),
        F.sum("n").over(wcum).alias("cn"),
    )
    a = cum.select(
        "key",
        F.col("h").alias("ha"),
        (F.col("cs") - F.col("s")).alias("csa"),
        (F.col("cn") - F.col("n")).alias("cna"),
    )
    b = cum.select(
        "key",
        F.col("h").alias("hb"),
        F.col("cs").alias("csb"),
        F.col("cn").alias("cnb"),
    )
    pairs = a.join(b, "key").filter(F.col("ha") <= F.col("hb"))
    q = floordiv(
        (F.col("csb") - F.col("csa")) * F.lit(1_000_000),
        (F.col("cnb") - F.col("cna")).cast("long"),
    )
    # suffix min over b >= h within each (key, a): evaluate at h = hb
    wsuf = (
        Window.partitionBy("key", "ha")
        .orderBy(F.desc("hb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suff = pairs.select(
        "key",
        "ha",
        F.col("hb").alias("h"),
        F.min(q.cast("long")).over(wsuf).alias("m"),
    )
    fit = suff.groupBy("key", "h").agg(F.max("m").alias("fit_micro"))
    raw = hourly.select(
        "key",
        "h",
        F.col("n").alias("n_obs"),
        floordiv(F.col("s") * F.lit(1_000_000), F.col("n"))
        .cast("long")
        .alias("raw_micro"),
    )
    return raw.join(fit, ["key", "h"]).select(
        "key",
        F.col("h").cast("int").alias("hour"),
        "n_obs",
        "raw_micro",
        F.col("fit_micro").cast("long").alias("fit_micro"),
    )
