"""Changepoint detection per series: CUSUM (parametric) and Pettitt
(rank-based, outlier-robust).

The classic offline CUSUM statistic: with S_i the running sum of
deviations from the series mean, the most likely single changepoint is
argmax |S_i|, and |S_i| / (sd * sqrt(n)) is its normalized magnitude
(values ≳ 1.36 reject "no shift" at ~5% for Brownian-bridge limits).
Everything is one hash-partition by key plus window algebra — no UDFs,
no collect — so a million series scan as one co-partitioned pass; the
per-key state Catalyst carries is O(1).

The before/after mean-shift estimate falls out of the same running sum
in closed form: mean_before = mean + S_cp/i, mean_after =
mean - S_cp/(n-i), so delta = -S_cp * n / (i * (n - i)) — no second
scan over the split halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Most likely mean-shift changepoint per key.

    Returns (key, cp_ts, cp_idx, n_obs, stat, delta): the timestamp and
    1-based index of argmax |S_i| (ties broken by earliest (ts, value)
    — the cumulative order is pinned to (ts, value) so duplicate
    timestamps stay deterministic), the normalized CUSUM statistic, and
    the closed-form before/after mean difference. The last row is
    excluded as a candidate (S_n == 0 identically; a "changepoint"
    after the final observation is meaningless). Keys shorter than
    ``min_points`` or with zero variance are dropped.
    """
    w_k = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, value)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prepped = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_k))
        .withColumn("_mean", F.avg(value).over(w_k))
        .withColumn("_sd", F.stddev_samp(value).over(w_k))
        .withColumn("_s", F.sum(F.col(value) - F.col("_mean")).over(w_cum))
        .withColumn("_i", F.row_number().over(w_ord))
        .filter(
            (F.col("_n") >= min_points)
            & (F.col("_sd") > 0)
            & (F.col("_i") < F.col("_n"))
        )
    )
    pick = F.row_number().over(
        Window.partitionBy(key).orderBy(
            F.abs(F.col("_s")).desc(), F.col(ts).asc(), F.col(value).asc()
        )
    )
    return (
        prepped.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("cp_ts"),
            F.col("_i").alias("cp_idx"),
            F.col("_n").alias("n_obs"),
            (F.abs("_s") / (F.col("_sd") * F.sqrt("_n"))).alias("stat"),
            (
                -F.col("_s") * F.col("_n")
                / (F.col("_i") * (F.col("_n") - F.col("_i")))
            ).alias("delta"),
        )
    )


def pettitt_changepoint(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Pettitt (1979) non-parametric single-changepoint test per key.

    The statistic U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j) is the
    Mann-Whitney displacement between the prefix and the suffix; the
    changepoint is argmax_t |U_t| over t in [1, n-1]. The O(n^2)
    double sum collapses to window algebra through the midrank
    identity sum_{j != i} sgn(x_i - x_j) = 2*r_i - (n+1) (r_i the
    tie-averaged rank), giving U_t = 2*R_t - t*(n+1) with R_t the
    time-ordered running sum of midranks. 2*r_i = 2*min_rank +
    ties - 1 is an integer, so every intermediate is exact integer
    arithmetic — no float divergence anywhere.

    Plan: one hash-partition by key, three windows (value-order rank,
    per-(key,value) tie count, time-order cumsum) — no UDFs, no
    collect; scales to millions of series as one co-partitioned pass.

    Returns (key, cp_ts, cp_idx, n_obs, k_stat, p_approx): timestamp
    and 1-based index of the split (ties broken by earliest (ts,
    value)), the max statistic K, and the standard significance
    approximation p = 2*exp(-6K^2/(n^3+n^2)).
    """
    w_k = Window.partitionBy(key)
    w_val = Window.partitionBy(key).orderBy(value)
    w_tie = Window.partitionBy(key, value)
    w_ord = Window.partitionBy(key).orderBy(ts, value)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prepped = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_k))
        # 2*midrank as an exact long: 2*min_rank + (#ties - 1)
        .withColumn(
            "_mr2",
            2 * F.rank().over(w_val) + F.count(F.lit(1)).over(w_tie) - F.lit(1),
        )
        .withColumn("_i", F.row_number().over(w_ord))
        .withColumn(
            "_u",
            F.sum("_mr2").over(w_cum) - F.col("_i") * (F.col("_n") + F.lit(1)),
        )
        .filter((F.col("_n") >= min_points) & (F.col("_i") < F.col("_n")))
    )
    pick = F.row_number().over(
        Window.partitionBy(key).orderBy(
            F.abs(F.col("_u")).desc(), F.col(ts).asc(), F.col(value).asc()
        )
    )
    n, k = F.col("_n"), F.abs(F.col("_u"))
    return (
        prepped.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("cp_ts"),
            F.col("_i").alias("cp_idx"),
            F.col("_n").alias("n_obs"),
            k.cast("long").alias("k_stat"),
            (2 * F.exp(-6 * k * k / (n * n * n + n * n))).alias("p_approx"),
        )
    )


def mood_changepoint(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Mood-type SCALE (dispersion) changepoint per key — the variance
    sibling of pettitt_changepoint's location test.

    Mood's statistic for a split at t is the prefix sum of squared
    centered ranks; scanning all t (the CPM convention, Ross et al.
    JSS 2015) standardizes each prefix by its exact
    sampling-without-replacement moments and takes argmax |z|. With
    c_i = 2*r_i - (n+1) (midranks doubled, so ties stay integers) and
    m_i = c_i^2:

        M_t = sum_{i<=t} m_i            (cumulative, time order)
        E_t = t * mean(m)               (mean over the key's m values)
        V_t = t(n-t)/(n-1) * popvar(m)  (exact hypergeometric variance)
        z_t = (M_t - E_t) / sqrt(V_t)

    mean(m)/popvar(m) are computed EMPIRICALLY from exact integer sums
    (not the no-ties closed form), so tie correction is automatic and
    every input to the float z expression is an exact integer —
    identical doubles in any engine, no quantization needed anywhere.
    z < 0 at the changepoint means the prefix is LESS dispersed
    (variance increased afterwards).

    Returns (key, cp_ts, cp_idx, n_obs, m_stat, z): the split
    maximizing |z_t| over t in [1, n-1] (ties broken by earliest
    (ts, value)), the exact integer prefix statistic, and its signed
    z-score. Plan: one hash-partition by key, window algebra only.
    Integer-exactness bound: the moment sums are carried in
    decimal(38,0) (the widest exact integer both engines share), whose
    tightest product here is n·Σm² <= 16n^6 — exact for n per key up to
    ~1.3M observations, and ENFORCED: longer keys raise at runtime
    (assert_true) instead of silently wrapping; chunk or downsample
    them first (the DuckDB side is HUGEINT and unbounded).
    """
    w_k = Window.partitionBy(key)
    w_val = Window.partitionBy(key).orderBy(value)
    w_tie = Window.partitionBy(key, value)
    w_ord = Window.partitionBy(key).orderBy(ts, value)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    n = F.count(F.lit(1)).over(w_k)
    c = (
        2 * F.rank().over(w_val)
        + F.count(F.lit(1)).over(w_tie)
        - F.lit(1)
        - (n + F.lit(1))
    )
    # moment sums in decimal(38,0): |c| <= 2n so m <= 4n^2, and the
    # widest exact value needed below is n*Σm² <= 16n^6 — safe to
    # n ~ 1.3e6 per key, with the bound enforced loudly (non-ANSI
    # int64 would instead wrap silently past ~3.5e3 and emit wrong
    # changepoints while the HUGEINT oracle stayed exact)
    _N_EXACT_BOUND = 1_300_000
    md = (c * c).cast("decimal(38,0)")
    prepped = (
        df.withColumn("_n", n)
        .withColumn(
            "_ok",
            F.assert_true(
                n <= F.lit(_N_EXACT_BOUND),
                F.lit(
                    "mood_changepoint: key exceeds the decimal(38,0) "
                    f"exactness bound of {_N_EXACT_BOUND} observations; "
                    "chunk or downsample first"
                ),
            ),
        )
        .withColumn("_i", F.row_number().over(w_ord))
        .withColumn("_mt", F.sum(md).over(w_cum))
        .withColumn("_sm", F.sum(md).over(w_k))
        .withColumn("_sm2", F.sum(md * md).over(w_k))
        # _ok is NULL on every surviving row; referencing it in the
        # filter forces the assert to evaluate (it would otherwise be
        # pruned as dead code)
        .filter(
            (F.col("_n") >= min_points)
            & (F.col("_i") < F.col("_n"))
            & F.col("_ok").isNull()
        )
    )
    nn = F.col("_n").cast("double")
    t = F.col("_i").cast("double")
    mean_m = F.col("_sm") / nn
    popvar_m = F.col("_sm2") / nn - mean_m * mean_m
    v_t = t * (nn - t) / (nn - 1) * popvar_m
    z = (F.col("_mt") - t * mean_m) / F.sqrt(v_t)
    # zero-dispersion keys (all midranks equal, e.g. constant series)
    # have no scale changepoint; the drop test is EXACT integer
    # arithmetic (n*Σm² - (Σm)² > 0), never a float threshold
    scored = prepped.filter(
        F.col("_n") * F.col("_sm2") - F.col("_sm") * F.col("_sm") > 0
    ).withColumn("_z", z)
    pick = F.row_number().over(
        Window.partitionBy(key).orderBy(
            F.abs(F.col("_z")).desc(), F.col(ts).asc(), F.col(value).asc()
        )
    )
    return (
        scored.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("cp_ts"),
            F.col("_i").alias("cp_idx"),
            F.col("_n").alias("n_obs"),
            F.col("_mt").cast("long").alias("m_stat"),
            F.round("_z", 6).alias("z"),
        )
    )


def poisson_cusum_daily(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    baseline_days: int = 14,
    h_excess: int = 20,
) -> DataFrame:
    """One-sided Poisson CUSUM on the per-key DAILY event count
    (Page 1954; Lucas 1985's counted-data CUSUM) — the volume-surge
    monitor that complements cusum_changepoint (retrospective, on
    values) and western_electric (level rules, on values): it
    accumulates the EXCESS of each day's count over the key's own
    Phase-I reference and alarms when the cumulative excess passes h.

    Pure-integer device: with the reference kbar = K/B (K = events in
    the first B span days), clearing by B makes the recursion exact —

        S_i = max(0, S_{i-1} + B*y_i - K),   S in units of 1/B events
        alarm_i = S_i > B*h_excess

    no float exists anywhere in the family; the stream twin
    (streaming/pcusum_stream.py, #34) carries (lo, cur, cc, K, S, n)
    integers and is bit-equal by construction.  Day i runs over the
    COMPLETE span (silent days count 0 and bleed the statistic down
    by K — exactly the behavior a rate monitor needs); the ledger
    emits every CLOSED evaluated day (a day closes when a later
    day's event exists — the rate_prefix discipline), so batch and
    stream agree on the emission set.

    Plan: one (key, day) hash agg -> ONE grouped Arrow batch per key
    (zero-fill inside the batch, the theta device).  Oracle: the
    identical integer recursion as a DuckDB recursive CTE.

    Returns (key, day, y, s_scaled, alarm) for closed days past the
    baseline; keys whose span is <= ``baseline_days`` + 1 emit
    nothing."""
    import numpy as np
    import pandas as pd

    from tits_spark.functions.exprs import epoch_us

    b = int(baseline_days)
    h = int(h_excess)
    daily = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(86_400_000_000)).cast("long").alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d", kind="stable")
        dd = pdf["d"].to_numpy(np.int64)
        cc = pdf["c"].to_numpy(np.int64)
        lo, mx = int(dd[0]), int(dd[-1])
        span = mx - lo + 1
        if span <= b + 1:
            return pd.DataFrame(
                columns=["key", "day", "y", "s_scaled", "alarm"]
            )
        y = np.zeros(span, dtype=np.int64)
        y[dd - lo] = cc
        kk = int(y[:b].sum())
        s = 0
        out = []
        # closed days only: indices b .. span-2 (the max observed day
        # at index span-1 stays open)
        for i in range(b, span - 1):
            s = s + b * int(y[i]) - kk
            if s < 0:
                s = 0
            out.append(
                (
                    str(pdf["key"].iloc[0]),
                    lo + i,
                    int(y[i]),
                    s,
                    bool(s > b * h),
                )
            )
        return pd.DataFrame(
            out, columns=["key", "day", "y", "s_scaled", "alarm"]
        )

    # numbered repartition: the daily-count frame is tiny in bytes, so
    # AQE's advisory coalescing lands every per-key CUSUM recursion on
    # 1-2 tasks (the holt device; exempt from coalescing, satisfies the
    # grouped UDF's clustered distribution — no second exchange)
    nparts = daily.sparkSession.sparkContext.defaultParallelism
    return daily.repartition(nparts, "key").groupBy("key").applyInPandas(
        fn,
        schema="key string, day long, y long, s_scaled long, alarm boolean",
    )
