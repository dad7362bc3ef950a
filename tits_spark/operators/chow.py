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

    # Round-6 perf: the original accumulated 18 CONDITIONAL decimal
    # products per row (3 segments x 6 sums). The pooled segment is
    # exactly the sum of the two halves, and inside the documented
    # envelope (~3e4 hourly buckets at 1e4-cent levels; binding sum
    # sum(c^2) <= n*cmax^2) every sufficient statistic fits int64 —
    # so: 6 LONG sums per (key, half) in a codegen hash aggregate,
    # pooled derived by addition, decimal only in the per-KEY closed
    # form. Values are exact integers in both representations, so the
    # SSEs and F are bit-identical (oracle SQL unchanged). Because
    # int64 wrap is silent, emission is gated by a raise_error on the
    # wrap-safe bounds (mood_changepoint precedent).
    s = seg.groupBy("key", "h").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("t").alias("st_s"),
        F.sum(F.col("t") * F.col("t")).alias("st2_s"),
        F.sum("c").alias("sc_s"),
        F.sum(F.col("c") * F.col("c")).alias("sc2_s"),
        F.sum(F.col("t") * F.col("c")).alias("stc_s"),
        F.max(F.abs("c")).alias("_cmax_s"),
    )
    names = ("n", "st", "st2", "sc", "sc2", "stc")
    halves = []
    for tag, hval in (("1", 1), ("2", 0)):
        halves += [
            F.sum(F.when(F.col("h") == hval, F.col(f"{nm}_s"))).alias(
                f"{nm}_{tag}"
            )
            for nm in names
        ]
    a = s.groupBy("key").agg(*halves, F.max("_cmax_s").alias("_cmax"))
    for nm in names:
        a = a.withColumn(f"{nm}_p", F.col(f"{nm}_1") + F.col(f"{nm}_2"))

    def _q(tag):
        n = F.col(f"n_{tag}").cast(DEC)
        st = F.col(f"st_{tag}").cast(DEC)
        st2 = F.col(f"st2_{tag}").cast(DEC)
        sc = F.col(f"sc_{tag}").cast(DEC)
        sc2 = F.col(f"sc2_{tag}").cast(DEC)
        stc = F.col(f"stc_{tag}").cast(DEC)
        sxx = n * st2 - st * st
        syy = n * sc2 - sc * sc
        sxy = n * stc - st * sc
        q = sxx * syy - sxy * sxy
        return (q.cast("double") / (n * sxx).cast("double")).alias(
            f"sse_{tag}"
        )

    n_l = F.col("n_p")
    cmax_d = F.col("_cmax").cast(DEC)
    overflow = (
        (n_l.cast(DEC) * cmax_d * cmax_d
         > F.lit("9000000000000000000").cast(DEC))
        | (n_l.cast(DEC) * n_l.cast(DEC) * cmax_d
           > F.lit("18000000000000000000").cast(DEC))
        | (n_l > F.lit(3000000))
    )
    b = a.select(
        "key",
        F.when(
            overflow,
            F.raise_error(
                "chow_test: int64 envelope exceeded (n * cents^2 too "
                "large) — re-bucket to a coarser tier first"
            ).cast("long"),
        ).otherwise(F.col("n_p")).alias("n_grid"),
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
