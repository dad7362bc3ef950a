"""Sessionization and time-decayed smoothing of irregular event
streams.

The reference treats irregularity as the null model (absent rows ARE
the gaps, ref:guess_lag.c:205-224); these operators are the two most
common gap-aware derivations a transcripts pipeline asks for on top of
that model:

 - ``sessionize``: split each key's stream into sessions wherever the
   inter-event gap exceeds a threshold — the conversation-boundary
   analog of the reference's crop-after-fire window reset
   (ref:guess_lag.c:319-325). Pure window algebra: one lag + one
   running sum, a single shuffle on the key.
 - ``ewma_irregular``: exponentially-time-decayed mean with weights
   exp(-(t_i - t_j)/tau) over all j <= i. The naive form is O(n^2);
   factoring exp(-(t_i-t_j)/tau) = exp(-t_i/tau) * exp(t_j/tau) turns
   both numerator and denominator into ordered running sums — O(n),
   pure column algebra, whole-stage codegen, identical math in ANSI SQL
   for the oracle. Timestamps are rebased per key so the exponent
   magnitude is bounded by (key's time span)/tau; for span/tau beyond
   ~700 (double exp overflow) use a larger tau or a chunked rebase —
   at tier granularity (tau >= hours, spans <= years) this bound is
   never approached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import ts_seconds


def sessionize(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Assign a per-key session index: a new session starts at the
    first event and whenever the silence since the previous event is at
    least ``gap_seconds`` (>=, matching Spark's native session_window
    whose window [start, last+gap) excludes an event landing exactly on
    the boundary). Adds ``session_idx`` (1-based within key)."""
    w = Window.partitionBy(key).orderBy(ts)
    t = ts_seconds(F.col(ts))
    is_new = F.when(
        t - F.lag(t).over(w) >= gap_seconds, F.lit(1)
    ).otherwise(F.lit(0))
    # first row per key has NULL lag -> otherwise(0); make it open a
    # session by starting the running count at 1
    return df.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )


def session_stats(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Per-session aggregate view: one row per (key, session_idx) with
    event count, start/end timestamps, duration, and value sum. One
    extra hash aggregate on top of sessionize's single window shuffle
    (same key prefix — no second exchange)."""
    s = sessionize(df, key, ts, gap_seconds)
    t = ts_seconds(F.col(ts))
    return (
        s.groupBy(key, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
            (F.max(t) - F.min(t)).alias("duration_s"),
            F.sum(value).alias("v_sum"),
        )
    )


def session_stats_native(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Same per-session aggregates via Spark's built-in
    ``session_window`` — a genuinely different algorithm (Catalyst
    merges overlapping [t, t+gap) intervals inside the aggregate)
    that must produce identical sessions to the lag+running-sum
    formulation; tests assert the two agree row-for-row. This is also
    the form that runs under Structured Streaming with a watermark
    (streaming/session_stream.py)."""
    t = ts_seconds(F.col(ts))
    return (
        df.groupBy(key, F.session_window(ts, f"{int(gap_seconds)} seconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
            (F.max(t) - F.min(t)).alias("duration_s"),
            F.sum(value).alias("v_sum"),
        )
        .drop("session_window")
    )


def ewma_irregular(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    tau_seconds: float = 86400.0,
    out: str = "ewma",
) -> DataFrame:
    """Time-decayed running mean over an irregular series:
    ewma_i = sum_j<=i v_j e^{-(t_i-t_j)/tau} / sum_j<=i e^{-(t_i-t_j)/tau}.

    Computed as a ratio of two ordered prefix sums after factoring the
    decay (see module docstring): O(n) per key, no UDF, one shuffle."""
    wk = Window.partitionBy(key)
    w = wk.orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    t_rel = ts_seconds(F.col(ts)) - F.min(ts_seconds(F.col(ts))).over(wk)
    g = F.exp(t_rel / F.lit(tau_seconds))
    num = F.sum(F.col(value) * g).over(w)
    den = F.sum(g).over(w)
    return df.withColumn(out, num / den)
