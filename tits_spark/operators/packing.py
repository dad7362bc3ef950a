"""Sequence packing: concat-and-chunk document streams into
fixed-token-budget training examples.

The standard LLM pretraining layout concatenates documents in a stable
order and cuts the token stream every ``budget`` tokens; each document
therefore lands at a deterministic (chunk_id, offset) that depends only
on the exclusive running token total before it. That running total is a
global ordered cumulative sum — the one primitive that is trivial in
single-node SQL (``sum() over (order by id)``) and a scaling trap in
Spark: a global ``Window.orderBy`` collapses to ONE partition and
serializes the whole table through a single task.

``chunk_stream`` instead computes the identical result with the
two-phase distributed prefix-sum pattern:

 1. split the id range into ``n_buckets`` contiguous range buckets
    (pure arithmetic on the id — no sort, no sampling);
 2. per-bucket cumulative sums via a window partitioned BY BUCKET
    (parallel across buckets, each a bounded task);
 3. bucket totals — ``n_buckets`` rows — get their own tiny prefix sum
    and are broadcast-joined back as per-bucket offsets.

Same answer as the single-partition window, shuffle bounded by the
bucket count, every stage parallel. This is the pattern to reach for
whenever "global running total" shows up at scale (lineage offsets,
global row numbers, file splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_stream(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document its place in the concatenated token stream,
    ordered by ``id_col``: ``chunk_id = floor(cum_before / budget)``,
    ``offset = cum_before % budget``, plus the number of ``budget``-
    sized chunks the document spans. Deterministic, parallel (see
    module docstring), exactly equal to the naive global-window result.
    """
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:  # empty input: zero chunks, not a TypeError
        return df.select(
            F.col(id_col),
            F.col(tokens_col).cast("int").alias("n_tokens"),
            F.lit(0).cast("long").alias("cum_before"),
            F.lit(0).cast("long").alias("chunk_id"),
            F.lit(0).cast("long").alias("offset"),
            F.lit(0).cast("long").alias("n_chunks"),
        ).limit(0)
    span = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    bucketed = df.withColumn(
        "_bkt", ((F.col(id_col) - F.lit(int(lo))) / F.lit(span)).cast("long")
    )

    # phase 1+2: per-bucket exclusive running totals (parallel)
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_local_before", F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0))
    )

    # phase 3: tiny prefix sum over bucket totals, broadcast back
    # bounded-global-window: runs on the n_buckets-row per-bucket totals
    # frame (n_buckets ~ rows/2^20), never on the row-level frame
    w_bkt = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("_bkt")
        .agg(F.sum(tokens_col).alias("_tot"))
        .withColumn("_bkt_before", F.coalesce(F.sum("_tot").over(w_bkt), F.lit(0)))
        .select("_bkt", "_bkt_before")
    )

    cum = F.col("_local_before") + F.col("_bkt_before")
    # integer `div` throughout: `cum / budget` would be a double Divide,
    # which loses exactness once the running token total passes 2^53 —
    # reachable at 10^12 docs — and diverges from the oracle's `//`
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn("cum_before", cum.cast("long"))
        .select(
            id_col,
            F.col(tokens_col).alias("n_tokens"),
            "cum_before",
            F.expr(f"cum_before div {budget}").alias("chunk_id"),
            F.pmod("cum_before", F.lit(budget)).cast("long").alias("offset"),
            F.expr(
                f"(cum_before + {tokens_col} + {budget - 1}) div {budget}"
                f" - cum_before div {budget}"
            ).alias("n_chunks"),
        )
    )
