"""Chow (1960) structural-break F-test at the mid-sample point per
key — did the level/trend regime of the series CHANGE between the
first and second half of its history? The known-breakpoint complement
of segreg (which SEARCHES for the break) and var_backtest (whose
row_number half-split protocol this reuses): segreg answers "where",
Chow answers "is the split real" with an F calibration.

On the hourly LOCF grid with global index t = 1..n and cents c_t,
each regression's residual sum of squares has the closed form

    n_i * Sxx_i * SSE_i = Sxx_i * Syy_i - Sxy_i^2  =: Q_i

where Sxx = n*sum(t^2) - (sum t)^2 etc. are EXACT decimal integers
accumulated per segment (pooled, first half, second half) from the
same five windowed sums. The Chow statistic over k = 2 parameters:

    F = ((SSE_p - SSE_1 - SSE_2) / 2) / ((SSE_1 + SSE_2) / (n - 4))

Each SSE_i = Q_i / (n_i * Sxx_i) is ONE division of exact decimals
(identical doubles on both engines below the decimal(38,0) envelope:
Q <= n^4 * c^2-ish — fine to ~3e4 hourly buckets at 1e4-cent levels;
past that re-bucket to the daily tier, the kpss envelope note); F is
a fixed double tree over the three, round 6, NULL when the pooled
residual is zero at the grain (flat series) or a half is degenerate
(Sxx_i = 0, impossible for n_i >= 2 on the regular grid).

Plan shape: ONE raw scan, the grid's two exchanges, one (key)-window
chain for the split + per-segment sums, one final agg on hash(key).
No join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv
from tits_spark.operators.granger import locf_bucket_grid

DEC = "decimal(38,0)"
D19 = "decimal(19,0)"


def chow_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    min_obs: int = 40,
) -> DataFrame:
    """Per-key Chow F-test of a mid-sample trend break on the hourly
    LOCF grid.

    Returns (key, n_grid, n1, n2, sse1, sse2, sse_p, f_chow); keys
    shorter than ``min_obs`` buckets drop; F NULL when the pooled
    residual vanishes."""
    mo = max(int(min_obs), 16)

    grid = locf_bucket_grid(
        df.withColumn("series", F.lit("x")),
        key=key, ts=ts, value=value, series="series",
        x_side="x", y_side="_none", bucket_secs=bucket_secs,
    ).select("key", "b", F.col("xc").alias("c"))

    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("b")
    base = grid.select(
        "key",
        "c",
        F.row_number().over(wo).alias("t"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("n") >= mo)
    seg = base.withColumn(
        "h", (F.col("t") <= floordiv(F.col("n"), 2)).cast("int")
    )

    t_d = F.col("t").cast(D19)
    c_d = F.col("c").cast(D19)

    def _sums(cond):
        w = F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast(D19)
        return [
            F.sum(w).cast(DEC),
            F.sum(w * t_d).cast(DEC),
            F.sum(w * t_d * F.col("t")).cast(DEC),
            F.sum(w * c_d).cast(DEC),
            F.sum(w * c_d * F.col("c")).cast(DEC),
            F.sum(w * t_d * F.col("c")).cast(DEC),
        ]

    names = ("n", "st", "st2", "sc", "sc2", "stc")
    aggs = []
    for tag, cond in (
        ("p", F.lit(True)),
        ("1", F.col("h") == 1),
        ("2", F.col("h") == 0),
    ):
        aggs += [
            e.alias(f"{nm}_{tag}") for nm, e in zip(names, _sums(cond))
        ]
    a = seg.groupBy("key").agg(*aggs)

    def _q(tag):
        n = F.col(f"n_{tag}")
        sxx = n * F.col(f"st2_{tag}") - F.col(f"st_{tag}") * F.col(f"st_{tag}")
        syy = n * F.col(f"sc2_{tag}") - F.col(f"sc_{tag}") * F.col(f"sc_{tag}")
        sxy = n * F.col(f"stc_{tag}") - F.col(f"st_{tag}") * F.col(f"sc_{tag}")
        q = sxx * syy - sxy * sxy
        return (q.cast("double") / (n * sxx).cast("double")).alias(
            f"sse_{tag}"
        )

    b = a.select(
        "key",
        F.col("n_p").cast("long").alias("n_grid"),
        F.col("n_1").cast("long").alias("n1"),
        F.col("n_2").cast("long").alias("n2"),
        _q("p"),
        _q("1"),
        _q("2"),
    )
    num = (F.col("sse_p") - F.col("sse_1") - F.col("sse_2")) / F.lit(2.0)
    den = (F.col("sse_1") + F.col("sse_2")) / (
        F.col("n_grid") - F.lit(4)
    ).cast("double")
    f_chow = F.when(den > 0, F.round(num / den, 6) + F.lit(0.0))
    return b.select(
        "key",
        "n_grid",
        "n1",
        "n2",
        # 2dp, not 6: SSEs are cents^2-magnitude (~1e10), where a 6dp
        # quantum is sub-ulp and the engines' round() legitimately
        # disagrees (the kpss/garch lesson)
        (F.round(F.col("sse_1"), 2) + F.lit(0.0)).alias("sse1"),
        (F.round(F.col("sse_2"), 2) + F.lit(0.0)).alias("sse2"),
        (F.round(F.col("sse_p"), 2) + F.lit(0.0)).alias("sse_p"),
        f_chow.alias("f_chow"),
    )
