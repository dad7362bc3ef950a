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


def chi2_independence(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    cat_col: str = "event_type",
) -> DataFrame:
    """Per-key Pearson chi-square test of independence between
    ``cat_col`` and hour-of-day, with Cramer's V effect size — the
    significance-test partner of :func:`mutual_info_type_hour` on the
    SAME contingency lattice (Pearson 1900 / Cramer 1946, public
    formulae). MI measures HOW MUCH the mix depends on the hour;
    chi-square answers whether the dependence clears chance, and V
    normalizes it to [0,1] so keys of different sizes compare.

    Per cell, with exact integer counts O=n_uv, R=n_u, C=n_v, N=n:

        (O - RC/N)^2 / (RC/N)  ==  (O*N - R*C)^2 / (N*R*C)

    The numerator difference d = O*N - R*C is an exact int64
    (|d| <= N^2; N <= 3e9 per key before it leaves int64 — far above
    any per-key event count at this table's scale, re-bucket past it).
    d*d may exceed int64, so the per-cell term is evaluated in double
    from identical exact ints on both engines and quantized to the
    floor-1e9 lattice BEFORE the per-key sum — the same
    quantize-then-sum discipline as mutual_info: the aggregation is
    pure BIGINT and partial-agg order cannot move the result. Empty
    cells (O=0) contribute R*C/N == (R*C)^2/(N*R*C), so the statistic
    is over the FULL r x c table even though only observed cells are
    materialized: the observed-cell sum of (d^2 - (RC)^2)/(NRC)
    telescopes with the constant +N, because sum over the full grid
    of RC/N is exactly N.

        X2 = sum_observed [ (d^2 - (R*C)^2) / (N*R*C) ] + N
        V  = sqrt( X2 / (N * min(r-1, c-1)) )

    dof = (r-1)(c-1) over the PRESENT categories (r = distinct types,
    c = distinct hours with any event for the key); keys with r < 2
    or c < 2 return NULL statistics (independence is vacuous).

    Plan shape: identical to mutual_info — one shuffle for the joint
    counts, two window passes for the marginals riding the same
    exchange, one hash agg. Output bounded by keys x |types| x 24.
    """
    joint = (
        df.select(
            F.col(key).alias("key"),
            F.col(cat_col).alias("u"),
            F.hour(F.col(ts).cast("timestamp")).alias("v"),
        )
        .groupBy("key", "u", "v")
        .agg(F.count(F.lit(1)).alias("nuv"))
    )
    return chi2_finalize(joint)


def chi2_finalize(joint: DataFrame) -> DataFrame:
    """The statistic stage of :func:`chi2_independence` over a
    (key, u, v, nuv) contingency table — split out so the streaming
    twin (streaming/contingency_stream.py) can push its merged count
    deltas through the IDENTICAL expression tree (the hhi_finalize
    pattern): bit-equal batch/stream readouts by construction."""
    wk = Window.partitionBy("key")
    wu = Window.partitionBy("key", "u")
    wv = Window.partitionBy("key", "v")
    cells = (
        joint.withColumn("n", F.sum("nuv").over(wk))
        .withColumn("nu", F.sum("nuv").over(wu))
        .withColumn("nv", F.sum("nuv").over(wv))
    )
    d = (F.col("nuv") * F.col("n") - F.col("nu") * F.col("nv")).cast(
        "double"
    )
    rc = (F.col("nu") * F.col("nv")).cast("double")
    term = F.floor(
        (d * d - rc * rc)
        / (F.col("n").cast("double") * rc)
        * 1e9
    ).cast("long")
    agg = (
        cells.select(
            "key", "n", "u", "v", term.alias("q")
        )
        .groupBy("key")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.countDistinct("u").cast("long").alias("r_cats"),
            F.countDistinct("v").cast("long").alias("c_cats"),
            F.sum("q").alias("_sq"),
        )
    )
    dof_ok = (F.col("r_cats") >= 2) & (F.col("c_cats") >= 2)
    x2 = F.col("_sq").cast("double") / 1e9 + F.col("n").cast("double")
    mindim = F.least(F.col("r_cats"), F.col("c_cats")) - 1
    return agg.select(
        "key",
        "n",
        "r_cats",
        "c_cats",
        ((F.col("r_cats") - 1) * (F.col("c_cats") - 1)).alias("dof"),
        F.when(dof_ok, F.round(x2, 6)).alias("chi2"),
        F.when(
            dof_ok,
            F.round(
                F.sqrt(
                    F.greatest(x2, F.lit(0.0))
                    / (F.col("n").cast("double") * mindim.cast("double"))
                ),
                6,
            ),
        ).alias("cramers_v"),
    )
