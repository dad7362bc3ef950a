"""Western Electric control-chart rules on the individuals chart per
key (Western Electric SQC Handbook 1956; Montgomery, Introduction to
SQC ch. 5): the process-monitoring alarm battery that complements the
repo's sequential detectors (cusum = drift in the mean, page_hinkley
= drift with forgetting, crossings = fixed thresholds) with the zone
rules every SPC dashboard ships:

    rule 1:  a point beyond 3 sigma
    rule 2:  2 of 3 consecutive points beyond 2 sigma, same side
    rule 3:  4 of 5 consecutive points beyond 1 sigma, same side
    rule 4:  8 consecutive points on one side of the center line

Limits are calibrated CAUSALLY on each key's first ``baseline_n``
observations (the Phase-I sample): center = baseline mean, sigma =
baseline mean moving range / 1.128 (the d2 constant for n=2) — so
evaluation is a pure function of the prefix and the batch readout is
bit-reproducible by a stream twin.  Zone flags compare the exact
integer cents deviation against fixed double trees (CL and sigma on
the cents scale from exact BIGINT sums), so both engines branch on
identical doubles; rules 2-4 are integer window sums of those flags
over the evaluation rows only, gated on FULL windows (a 2-of-3 with
only two points of history is not a fire).  dev is emitted round 6,
signed zero normalized.

Plan shape (100 TB): one scan -> ONE (key)-window chain (row_number
+ lag share the sort) -> baseline hash agg joined back per key
(aggregate frame, broadcast-eligible) -> ONE second (key)-window
chain over evaluation rows for the rolling rule sums.  No cartesian,
no Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def _rules(base: DataFrame, b: int, alerts_only: bool) -> DataFrame:
    """Shared rule core over a row-numbered (key, _ts, v, c, rn,
    prev) frame; returns the flag columns before final projection."""
    limits = (
        base.filter(F.col("rn") <= b)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("c").alias("s"),
            F.sum(
                F.when(F.col("rn") >= 2, F.abs(F.col("c") - F.col("prev")))
            ).alias("mr"),
        )
        .filter(F.col("nb") == b)
        .select(
            "key",
            (F.col("s").cast("double") / F.lit(float(b))).alias("cl"),
            (
                (F.col("mr").cast("double") / F.lit(float(b - 1)))
                / F.lit(1.128)
            ).alias("sig"),
        )
        .filter(F.col("sig") > 0)
    )
    ev = base.filter(F.col("rn") > b).join(limits, "key")
    dev = F.col("c").cast("double") - F.col("cl")
    sig = F.col("sig")
    flagged = ev.select(
        "key",
        "_ts",
        "v",
        "rn",
        dev.alias("dev"),
        (dev > F.lit(3.0) * sig).alias("up3"),
        (dev < F.lit(-3.0) * sig).alias("dn3"),
        (dev > F.lit(2.0) * sig).cast("int").alias("up2"),
        (dev < F.lit(-2.0) * sig).cast("int").alias("dn2"),
        (dev > sig).cast("int").alias("up1"),
        (dev < -sig).cast("int").alias("dn1"),
        (dev > 0).cast("int").alias("up0"),
        (dev < 0).cast("int").alias("dn0"),
    )
    we = Window.partitionBy("key").orderBy("rn")

    def roll(col: str, n: int):
        return F.sum(col).over(we.rowsBetween(-(n - 1), 0))

    er = F.col("rn") - b  # 1-based position among evaluation rows
    out = flagged.select(
        "key",
        "_ts",
        "v",
        "dev",
        (F.col("up3") | F.col("dn3")).alias("r1"),
        (
            (er >= 3)
            & (
                ((roll("up2", 3) >= 2) & (F.col("up2") == 1))
                | ((roll("dn2", 3) >= 2) & (F.col("dn2") == 1))
            )
        ).alias("r2"),
        (
            (er >= 5)
            & (
                ((roll("up1", 5) >= 4) & (F.col("up1") == 1))
                | ((roll("dn1", 5) >= 4) & (F.col("dn1") == 1))
            )
        ).alias("r3"),
        (
            (er >= 8)
            & ((roll("up0", 8) == 8) | (roll("dn0", 8) == 8))
        ).alias("r4"),
    )
    if alerts_only:
        out = out.filter(
            F.col("r1") | F.col("r2") | F.col("r3") | F.col("r4")
        )
    return out


def western_electric(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    baseline_n: int = 50,
    alerts_only: bool = True,
) -> DataFrame:
    """WE rules 1-4 per key.  Returns (key, ts_us, value, dev, r1,
    r2, r3, r4) for evaluation rows (position > ``baseline_n``); with
    ``alerts_only`` only rows with at least one rule firing are kept.
    Keys with fewer than ``baseline_n`` + 1 rows emit nothing; a
    zero-sigma baseline emits nothing (degenerate process)."""
    b = int(baseline_n)
    w = Window.partitionBy("key").orderBy("_ts", "_tb")
    base = (
        df.select(
            F.col(key).alias("key"),
            F.col(ts).alias("_ts"),
            F.col(tiebreak).alias("_tb"),
            F.col(value).alias("v"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("c").over(w))
    )
    out = _rules(base, b, alerts_only)
    return out.select(
        "key",
        epoch_us("_ts").alias("ts_us"),
        F.col("v").alias("value"),
        (F.round(F.col("dev"), 6) + F.lit(0.0)).alias("dev"),
        "r1",
        "r2",
        "r3",
        "r4",
    )


def western_electric_ticks(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    baseline_n: int = 50,
    alerts_only: bool = True,
) -> DataFrame:
    """WE rules over the replayable tick surface: (key, us) deduped
    to max cents, ordered by us — the streaming twin's batch side
    (ph_stream's ticks device).  Returns (key, us, c, dev, r1, r2,
    r3, r4) with dev the RAW double deviation (no rounding: the twin
    compares bit-for-bit and both sides compute the identical float
    tree)."""
    b = int(baseline_n)
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    w = Window.partitionBy("key").orderBy("_ts")
    base = (
        ticks.select(
            "key", F.col("us").alias("_ts"), F.col("c").alias("v"), "c"
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("c").over(w))
    )
    out = _rules(base, b, alerts_only)
    return out.select(
        "key",
        F.col("_ts").alias("us"),
        F.col("v").cast("long").alias("c"),
        "dev",
        "r1",
        "r2",
        "r3",
        "r4",
    )
