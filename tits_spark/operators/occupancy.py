"""Interval line-sweep: exact concurrency timeline over session intervals.

"How many sessions were active at each instant?" is the classic
line-sweep: emit +1 at each interval start and -1 at each (exclusive)
end, collapse simultaneous boundaries, and take the running sum in time
order.  The running sum is a GLOBAL ordered cumulative — the same
single-task trap `packing.chunk_stream` documents — so it is computed
with the identical two-phase distributed prefix-sum: arithmetic range
buckets on the boundary timestamp, per-bucket window cumsums in
parallel, and a broadcast of the tiny bucket-totals prefix.

Everything is exact integer arithmetic on epoch-µs boundaries and ±1
deltas; there is no float anywhere, so the DuckDB oracle (a plain
``sum() over (order by t)``) matches bit-for-bit.

Reference analogy: tits' windowed occupancy counting over tick streams
(`/root/reference/src/tits.c` sliding-count windows) — re-expressed as
a declarative sweep instead of a per-tick state machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def _distributed_cumsum(
    df: DataFrame, order_col: str, val_col: str, out_col: str, n_buckets: int = 64
) -> DataFrame:
    """Inclusive running sum of ``val_col`` in ``order_col`` order via
    the two-phase prefix-sum pattern (see packing.chunk_stream): range
    buckets by pure arithmetic, parallel per-bucket windows, broadcast
    bucket offsets.  ``order_col`` must be numeric and unique."""
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    b = df.withColumn(
        "_bkt", ((F.col(order_col) - F.lit(int(lo))) / F.lit(span)).cast("long")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_local", F.sum(val_col).over(w_in))
    # bounded-global-window: runs on the n_buckets-row totals frame only
    w_bkt = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("_bkt")
        .agg(F.sum(val_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_bkt), F.lit(0)))
        .select("_bkt", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_bkt", "_local", "_off")
    )


def concurrency_timeline(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Exact concurrency timeline of per-(key, day) session intervals.

    A session interval is ``[min event µs, max event µs + 1)`` for each
    (key, ``floor(t / bucket_us)``) group — half-open so a boundary
    where one session ends exactly as another starts nets to zero.
    Returns one row per distinct boundary instant:
    ``(t_us, delta, concurrency)`` with ``concurrency`` the number of
    open intervals in ``[t_us, next boundary)``.
    """
    e = df.select(F.col(key).alias("_k"), epoch_us(ts).alias("_u"))
    iv = e.groupBy(
        "_k", F.expr(f"_u div {int(bucket_us)}").alias("_d")
    ).agg(F.min("_u").alias("_s"), (F.max("_u") + F.lit(1)).alias("_e"))
    bounds = iv.select(F.col("_s").alias("t_us"), F.lit(1).alias("_dl")).unionAll(
        iv.select(F.col("_e").alias("t_us"), F.lit(-1).alias("_dl"))
    )
    deltas = bounds.groupBy("t_us").agg(F.sum("_dl").cast("long").alias("delta"))
    out = _distributed_cumsum(deltas, "t_us", "delta", "concurrency")
    return out.select("t_us", "delta", "concurrency")
