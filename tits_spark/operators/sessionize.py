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
   for the oracle. Overflow safety: the factored exponent is bounded by
   (key's time span)/tau, which overflows double exp beyond ~709 — so
   the timeline is segmented into chunks of EWMA_CHUNK_EXP*tau (=256),
   prefix sums run within a chunk (exp <= e^256), and the influence of
   earlier chunks arrives as a per-chunk carry decayed by e^{-256*d}:
   only predecessor chunks at distance 1 and 2 can contribute
   (e^{-768} underflows to exactly 0 in double), so the carry is two
   range-frame window sums over the chunk index — same exchange. The
   chunk-local rebase factor cancels in the num/den ratio, so results
   match the single-chunk factoring bit-for-near (~1e-15) on small
   spans and the naive O(n^2) definition on any span.
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


# Exponent budget per chunk of the segmented EWMA rebase. 256 keeps the
# within-chunk factor at e^256 (~1e111, far from double overflow at
# e^709) while 3 chunks of decay (e^-768) underflows to exactly 0.0 —
# so a carry over the two nearest populated predecessor chunks is exact
# to double precision.
EWMA_CHUNK_EXP = 256.0


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
    decay, segmented into EWMA_CHUNK_EXP*tau chunks so the factored
    exponent never exceeds 256 regardless of the key's time span (see
    module docstring).

    The cross-chunk carry needs each chunk's predecessor totals. Any
    predecessor >= 3 chunks away decays by e^-768, which underflows to
    exactly 0.0 — so only chunks at distance 1 and 2 can contribute,
    and both are RANGE window frames over the chunk index
    (``rangeBetween(-1, -1)`` / ``(-2, -2)``). That keeps the whole
    operator a single window chain: ONE exchange on the key, shared by
    every frame (Catalyst re-sorts within partitions for the two order
    specs, no extra shuffle) — no self-join, no second traversal of the
    input, no UDF. (An earlier formulation aggregated a per-chunk
    summary and joined it back, which re-executed the entire upstream
    scan + windows a second time — 2x the cost for identical output.)"""
    cw = float(EWMA_CHUNK_EXP) * float(tau_seconds)
    wk = Window.partitionBy(key)
    wc = Window.partitionBy(key, "_ewma_chunk").orderBy(ts).rowsBetween(
        Window.unboundedPreceding, 0)
    # chunk totals of the 1-away / 2-away chunks, as range frames over
    # the chunk index (empty frame -> NULL -> 0.0 carry)
    w1 = Window.partitionBy(key).orderBy("_ewma_chunk").rangeBetween(-1, -1)
    w2 = Window.partitionBy(key).orderBy("_ewma_chunk").rangeBetween(-2, -2)
    d1 = F.lit(float(EWMA_CHUNK_EXP))
    t_rel = ts_seconds(F.col(ts)) - F.min(ts_seconds(F.col(ts))).over(wk)

    def carry(term):
        # prev-chunk totals were accumulated against their own chunk's
        # local base; rescale by the chunk distance. The current chunk's
        # own rebase factor cancels in the final num/den ratio.
        return (
            F.coalesce(F.sum(term).over(w1) * F.exp(-d1), F.lit(0.0))
            + F.coalesce(F.sum(term).over(w2) * F.exp(-d1 * F.lit(2.0)), F.lit(0.0))
        )

    num_term = F.col(value) * F.col("_ewma_g")
    return (
        df.withColumn("_ewma_trel", t_rel)
        .withColumn("_ewma_chunk", F.floor(F.col("_ewma_trel") / F.lit(cw)))
        .withColumn(
            "_ewma_g",
            F.exp((F.col("_ewma_trel") - F.col("_ewma_chunk") * F.lit(cw))
                  / F.lit(tau_seconds)),
        )
        .withColumn(
            out,
            (F.sum(num_term).over(wc) + carry(num_term))
            / (F.sum(F.col("_ewma_g")).over(wc) + carry(F.col("_ewma_g"))),
        )
        .drop("_ewma_trel", "_ewma_chunk", "_ewma_g")
    )
