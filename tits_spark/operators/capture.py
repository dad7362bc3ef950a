"""Two-occasion capture–recapture estimate of a key's value-support
size — Chapman's (1951) bias-corrected Lincoln–Petersen estimator
with Seber's (1970) variance.  The abundance question that
complements good_turing (which estimates UNSEEN probability mass
from frequency-of-frequencies): how many distinct values does this
key's process actually have, given the two halves of its observation
window each sampled some of them?

Occasions are the two halves of the key's own span (split at
mid = min_us + (max_us - min_us)//2, exact integer microseconds):
a value is "captured" in occasion 1 iff its earliest event is before
mid, in occasion 2 iff its latest event is at-or-after mid — both
facts fall out of the (key, cents) lattice's min/max without a
second scan.  With n1, n2 marked counts and m recaptures:

    N_hat = (n1+1)(n2+1)/(m+1) - 1
    Var   = (n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)^2 (m+2))

exact integer lattices, two double trees (round 6).  N_hat >=
observed support always (both halves see a value => it is counted
once); N_hat >> observed signals heavy under-sampling.

Plan shape (100 TB): one scan -> (key, cents) min/max hash agg ->
ONE full-partition (key) window for the span -> one per-key hash agg
on the same exchange.  No joins, no Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def chapman_support(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_support: int = 20,
) -> DataFrame:
    """Chapman estimate of per-key distinct-cents support.

    Returns (key, n_obs, n1, n2, m, chapman_est, chapman_var); keys
    with observed support under ``min_support`` drop."""
    lat = (
        df.select(
            F.col(key).alias("key"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
            epoch_us(ts).alias("u"),
        )
        .groupBy("key", "c")
        .agg(F.min("u").alias("mn"), F.max("u").alias("mx"))
    )
    wk = Window.partitionBy("key")
    mid = F.min("mn").over(wk) + F.floor(
        (F.max("mx").over(wk) - F.min("mn").over(wk)) / 2
    ).cast("long")
    marked = lat.select(
        "key",
        (F.col("mn") < mid).cast("int").alias("o1"),
        (F.col("mx") >= mid).cast("int").alias("o2"),
    )
    agg = (
        marked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("o1").alias("n1"),
            F.sum("o2").alias("n2"),
            F.sum(F.col("o1") * F.col("o2")).alias("m"),
        )
        .filter(F.col("n_obs") >= int(min_support))
    )
    n1 = (F.col("n1") + 1).cast("double")
    n2 = (F.col("n2") + 1).cast("double")
    m1 = (F.col("m") + 1).cast("double")
    est = F.round(n1 * n2 / m1 - F.lit(1.0), 6) + F.lit(0.0)
    var = (
        F.round(
            (
                n1
                * n2
                * (F.col("n1") - F.col("m")).cast("double")
                * (F.col("n2") - F.col("m")).cast("double")
            )
            / (m1 * m1 * (m1 + F.lit(1.0))),
            6,
        )
        + F.lit(0.0)
    )
    return agg.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("m").cast("long").alias("m"),
        est.alias("chapman_est"),
        var.alias("chapman_var"),
    )
