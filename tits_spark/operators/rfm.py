"""RFM segmentation with exact, scale-safe quintile thresholds.

Recency / Frequency / Monetary scoring is the classic user-value
segmentation; the naive Spark spelling is ``ntile(5) over (order by
metric)`` — a global sort window that (a) collapses to one task and
(b) is nondeterministic under ties.  Both problems disappear by scoring
against exact nearest-rank quintile THRESHOLDS instead of row ranks:

  t_k = smallest value whose cumulative count >= ceil(k * n / 5)
  score = 1 + [v > t_1] + [v > t_2] + [v > t_3] + [v > t_4]

Ties share a score by construction (no ordering ambiguity), and the
cumulative count runs over DISTINCT metric values — a frame that is
already small (frequencies, cents) or near-unique with count 1
(recency), never the user table — with the same two-phase prefix-sum
used by packing/occupancy, then a 4-row broadcast back onto users.

All three metrics are exact integers: recency µs, event counts, and
monetary CENTS (``sum(round(value * 100))`` — per-row rounding of
2-decimal values is exact, and the integer sum is order-independent,
unlike a float ``sum(value)`` which varies with partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us
from tits_spark.operators.occupancy import _distributed_cumsum


def _quintile_scores(df: DataFrame, col: str, score_col: str, n: int) -> DataFrame:
    """Attach 1..5 ``score_col`` for integer column ``col`` via exact
    nearest-rank thresholds (see module docstring); ``n`` is the row
    count of ``df`` (passed in so callers scoring several metrics pay
    for one count, not one per metric)."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    cum = _distributed_cumsum(counts, col, "_c", "_cum")
    ranks = [(k * n + 4) // 5 for k in (1, 2, 3, 4)]
    th = cum.agg(
        *[
            F.min(F.when(F.col("_cum") >= F.lit(r), F.col(col))).alias(f"_t{k}")
            for k, r in zip((1, 2, 3, 4), ranks)
        ]
    )
    score = F.lit(1)
    for k in (1, 2, 3, 4):
        score = score + (F.col(col) > F.col(f"_t{k}")).cast("int")
    return (
        df.crossJoin(F.broadcast(th))
        .withColumn(score_col, score)
        .drop("_t1", "_t2", "_t3", "_t4")
    )


def rfm_scores(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key RFM table: exact integer metrics plus 1..5 quintile
    scores and the combined ``rfm = 100*r + 10*f + m`` segment code.

    ``r_score`` follows the metric direction (higher recency_us = staler
    user = higher quintile); flip downstream if "5 = best" is wanted.
    """
    e = df.select(F.col(key).alias("key"), epoch_us(ts).alias("_u"), F.col(value))
    mx = e.agg(F.max("_u").alias("_now"))
    base = (
        e.groupBy("key")
        .agg(
            F.max("_u").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            # coalesce per row so all-NULL-value users score 0 cents
            # (a typed integer) instead of a NULL that breaks quintiles
            F.sum(
                F.coalesce(F.round(F.col(value) * 100).cast("long"), F.lit(0))
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .withColumn("recency_us", (F.col("_now") - F.col("_last")).cast("long"))
        .drop("_last", "_now")
    )
    # the per-user frame feeds three threshold branches plus the final
    # scoring pass; cache it so the raw-event aggregation runs once, not
    # four times (base is |users| rows — tiny next to the event stream)
    base = base.cache()
    n = base.count()
    scored = _quintile_scores(base, "recency_us", "r_score", n)
    scored = _quintile_scores(scored, "frequency", "f_score", n)
    scored = _quintile_scores(scored, "monetary_cents", "m_score", n)
    return scored.select(
        "key",
        "recency_us",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm"
        ),
    )
