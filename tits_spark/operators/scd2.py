"""Slowly-changing-dimension (type 2) interval building from an event
stream, plus the as-of snapshot lookup over the result.

Classic warehouse reshaping: per key, consecutive runs of the same
attribute value collapse into one validity interval
[valid_from, valid_to) — valid_to is the NEXT version's start (NULL on
the current version), so the intervals tile the key's timeline with no
gaps or overlaps. This is the dimension-table dual of the reference's
tick stream (ref: /root/reference/src/tits.c treats each (t, value)
row independently; SCD2 is the compressed "state intervals" view the
retention tiers can join against).

Plan shape: one shuffle on key (window lag -> change flag -> running
version id), one hash agg per (key, version), one more window for
valid_to — all co-partitioned on key, so Spark reuses the single
exchange. The as-of lookup is a filter, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    attr: str = "attr",
) -> DataFrame:
    """Collapse per-key runs of equal ``attr`` (in (ts, attr) order —
    the attr tiebreak makes simultaneous rows deterministic) into SCD2
    rows (key, version, attr, valid_from, valid_to, n_events,
    is_current)."""
    w = Window.partitionBy(key).orderBy(F.col(ts), F.asc_nulls_first(attr))
    # null-safe change test: a NULL attr is a change from any non-NULL
    # value, and a run of NULLs collapses into one version (plain `!=`
    # would evaluate NULL and silently merge a NULL row into the prior
    # version, splitting it later in the groupBy). The row_number guard
    # keeps the first row a change even when its attr is NULL.
    flagged = df.select(key, ts, attr).withColumn(
        "_chg",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(attr).over(w).eqNullSafe(F.col(attr)),
            1,
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "version", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = versioned.groupBy(key, "version", attr).agg(
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key).orderBy("version")
    return runs.select(
        F.col(key).alias("key"),
        F.col("version").cast("long").alias("version"),
        F.col(attr).alias("attr"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def scd2_asof(intervals: DataFrame, at) -> DataFrame:
    """The dimension snapshot valid at timestamp ``at``: the single
    version per key with valid_from <= at < valid_to (current rows
    have valid_to NULL = +inf). Pure filter — no join, no shuffle."""
    t = F.lit(at).cast("timestamp")
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("key", "version", "attr", "valid_from", "valid_to")
