"""Classical distribution / randomness / random-walk tests, fully
declarative (no UDFs — every statistic is window + hash-agg algebra
that Catalyst keeps inside whole-stage codegen).

Four tests a time-series rollup pipeline actually runs against its
tiers (reference analog: the kinds of eligibility screens tits'
guess_lag applies before trusting a series — ref:
/root/reference/src/tsa.h:1 family):

 - :func:`ks_two_sample` — Kolmogorov–Smirnov two-sample distance
   between two labeled samples per key.  The D statistic is computed
   on the exact integer lattice ``|cumA*nB - cumB*nA|`` (max over the
   merged value grid), so engines agree bit-for-bit; only the final
   normalization divides.
 - :func:`runs_test` — Wald–Wolfowitz runs test for randomness around
   the per-key median.  Run/side counts are exact integers; the
   median is interpolation-pinned (percentile == quantile_cont), and
   every value is at least half a lattice step away from an even-count
   midpoint, so the above/below classification is ulp-safe.
 - :func:`variance_ratio` — Lo–MacKinlay VR(q) random-walk screen on
   the 2-decimal value lattice: both variances come from exact BIGINT
   moment sums of centi-unit differences, so the ratio is a pure
   function of integers.
 - :func:`spearman_xcorr` — Spearman rank correlation between two
   event-type activity series aligned on a common bucket grid.
   Average ranks are kept on the integer lattice as ``2*rank`` so tie
   handling never touches floats until the final correlation.

Scale notes (100 TB): every operator is one or two hash aggregations
plus key-partitioned windows — no self-joins, no grouped Python, no
global windows.  The KS merge grid groups by (key, value) BEFORE the
cumulative window, so the window input is the per-key distinct-value
count, not the raw row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_two_sample(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
) -> DataFrame:
    """Two-sample KS distance per key between the rows flagged
    ``is_a`` and the rest.

    Returns ``(key, n_a, n_b, d_num, ks_d)`` where ``d_num`` is the
    exact integer ``max |cumA*nB - cumB*nA|`` over the merged sorted
    value grid and ``ks_d = d_num / (n_a*n_b)`` rounded to 6dp.

    Ties (both samples sharing a value) are handled by grouping on
    (key, value) first: the ECDF step for a tied value lands after ALL
    rows at that value, which is the standard two-sample convention.
    """
    a = F.when(F.col(is_a), F.lit(1)).otherwise(F.lit(0))
    g = df.groupBy(key, value).agg(
        F.sum(a).alias("ca"),
        F.sum(F.lit(1) - a).alias("cb"),
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(key)
    cum = g.select(
        key,
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wtot).alias("n_a"),
        F.sum("cb").over(wtot).alias("n_b"),
    )
    return (
        cum.groupBy(key)
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
                )
            ).alias("d_num"),
        )
        .select(
            key,
            "n_a",
            "n_b",
            "d_num",
            F.round(
                F.col("d_num") / (F.col("n_a") * F.col("n_b")).cast("double"), 6
            ).alias("ks_d"),
        )
    )


def runs_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Wald–Wolfowitz runs test around the per-key median.

    Values equal to the median are dropped (the standard convention);
    the remainder is classified above/below, runs are counted in time
    order, and the continuity-free normal score is

        z = (R - mu) / sqrt(var),  mu = 1 + 2*n1*n0/n,
        var = 2*n1*n0*(2*n1*n0 - n) / (n^2 * (n-1)).

    Returns ``(key, n_above, n_below, n_runs, z)``.  All counts are
    exact integers; z is the shared closed form rounded to 6dp.

    Median safety: the interpolated median either equals a data value
    exactly (odd count, or tied center) or lies >= half a lattice step
    from every datum (even count, distinct centers), so the strict
    comparisons agree across engines despite the float midpoint.
    """
    med = df.groupBy(key).agg(
        F.percentile(value, F.lit(0.5)).alias("_med")
    )
    sided = (
        df.join(F.broadcast(med), key)
        .withColumn(
            "_s",
            F.when(F.col(value) > F.col("_med"), F.lit(1)).when(
                F.col(value) < F.col("_med"), F.lit(0)
            ),
        )
        .where(F.col("_s").isNotNull())
    )
    w = Window.partitionBy(key).orderBy(ts)
    chg = sided.select(
        key,
        F.col("_s").alias("s"),
        F.when(
            F.lag("_s").over(w).isNull() | (F.col("_s") != F.lag("_s").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    agg = chg.groupBy(key).agg(
        F.sum("s").alias("n_above"),
        F.sum(F.lit(1) - F.col("s")).alias("n_below"),
        F.sum("chg").alias("n_runs"),
    )
    n1, n0 = F.col("n_above").cast("double"), F.col("n_below").cast("double")
    n = n1 + n0
    mu = F.lit(1.0) + 2.0 * n1 * n0 / n
    var = 2.0 * n1 * n0 * (2.0 * n1 * n0 - n) / (n * n * (n - F.lit(1.0)))
    z = F.when(
        (F.col("n_above") > 0) & (F.col("n_below") > 0) & (n > 2),
        F.round((F.col("n_runs").cast("double") - mu) / F.sqrt(var), 6),
    )
    return agg.select(key, "n_above", "n_below", "n_runs", z.alias("z"))


def variance_ratio(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    q: int = 4,
    scale: int = 100,
) -> DataFrame:
    """Lo–MacKinlay variance-ratio VR(q) on the fixed-point lattice.

    Treats the per-key value series (time order) as a random-walk
    candidate: VR(q) = Var(q-step differences) / (q * Var(1-step
    differences)), both sample variances.  Values are quantized to
    ``round(value*scale)`` BIGINTs so the moment sums (Σd, Σd², Σs,
    Σs²) are exact integers; the ratio is the shared closed form of
    those integers, rounded to 6dp.  VR ≈ 1 for a random walk, < 1
    for mean reversion, > 1 for trending.

    Returns ``(key, n_1, n_q, sum_d2, sum_q2, vr)``.

    Overflow bound: |c| <= scale*max|value|; with 2-decimal data in
    ±1e6 the worst Σd² per key stays < 2^53 up to ~10^9 rows/key —
    far beyond any per-key series this engine rolls up.  (Past that,
    lift the sums to decimal(38,0) as mood_changepoint does.)
    """
    c = F.round(F.col(value) * scale).cast("long")
    w = Window.partitionBy(key).orderBy(ts)
    diffs = df.select(
        key,
        (c - F.lag(c, 1).over(w)).alias("d"),
        (c - F.lag(c, q).over(w)).alias("s"),
    )
    agg = diffs.groupBy(key).agg(
        F.count("d").alias("n_1"),
        F.sum("d").alias("sum_d"),
        F.sum(F.col("d") * F.col("d")).alias("sum_d2"),
        F.count("s").alias("n_q"),
        F.sum("s").alias("sum_s"),
        F.sum(F.col("s") * F.col("s")).alias("sum_q2"),
    )
    n1, nq = F.col("n_1").cast("double"), F.col("n_q").cast("double")
    var1 = (
        F.col("sum_d2").cast("double")
        - F.col("sum_d").cast("double") * F.col("sum_d").cast("double") / n1
    ) / (n1 - F.lit(1.0))
    varq = (
        F.col("sum_q2").cast("double")
        - F.col("sum_s").cast("double") * F.col("sum_s").cast("double") / nq
    ) / (nq - F.lit(1.0))
    vr = F.when(
        (F.col("n_1") > 1) & (F.col("n_q") > 1) & (var1 > 0),
        F.round(varq / (F.lit(float(q)) * var1), 6),
    )
    return agg.select(key, "n_1", "n_q", "sum_d2", "sum_q2", vr.alias("vr"))


def spearman_xcorr(
    df: DataFrame,
    key: str = "key",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Spearman rank correlation between two aligned series per key.

    Input is one row per (key, grid point) with the two series'
    values in ``a_col``/``b_col`` (e.g. hourly activity of two event
    types on the common hours).  Average ranks are materialized as
    ``2*avg_rank = 2*rank() + ties - 1`` — an exact INTEGER — so the
    Pearson-on-ranks moments (Σx, Σx², Σxy) are exact BIGINTs and the
    correlation is a shared closed form, rounded to 6dp.

    Returns ``(key, n, rho)``.
    """
    wa = Window.partitionBy(key).orderBy(a_col)
    wb = Window.partitionBy(key).orderBy(b_col)
    ta = Window.partitionBy(key, a_col)
    tb = Window.partitionBy(key, b_col)
    ranked = df.select(
        key,
        (2 * F.rank().over(wa) + F.count(F.lit(1)).over(ta) - 1).alias("ra"),
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(tb) - 1).alias("rb"),
    )
    agg = ranked.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sx"),
        F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    rho = F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6))
    return agg.select(key, "n", rho.alias("rho"))
