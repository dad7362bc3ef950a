"""As-of alignment (SURVEY.md §2.3 J3): join each left row to the most
recent right row at or before its timestamp, per key — the relational
form of the reference's gap-aware alignment of irregular series onto a
reference clock (ref:sacf.c:166-179 aligns via kernel bands; LOCF-style
as-of is the degenerate rectangular-kernel case).

Two strategies:

 - ``asof_join`` (default, scalable): union the two sides with a tag,
   one window sort per key carries the last right-side values forward
   onto left rows (the classic union-LOCF formulation — a single
   shuffle on key, no range join, no UDF).
 - ``asof_join_pandas``: cogrouped ``pd.merge_asof`` (SNIPPETS.md [1]) —
   per-key Arrow batches, useful when per-key data is huge and sorted
   merge beats the window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    right.ts <= left.ts (``direction='backward'``, default), the
    earliest right row with right.ts >= left.ts
    (``direction='forward'``), or the closer of the two
    (``direction='nearest'``, ties to backward) for the same key
    (NULLs when none, or when the match is further than
    ``tolerance_sec``). ``nearest`` additionally emits the chosen
    ``asof_gap_us`` distance."""
    from tits_spark.functions.exprs import ts_seconds

    if direction == "nearest":
        return _asof_nearest(left, right, key, ts, value_cols, tolerance_sec, suffix)
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        key, ts, *[F.col(c).alias(c + suffix) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    both = lhs.unionByName(rhs, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal ts -> "at or before"
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        # left rows sort before right rows at equal ts, frame looks
        # ahead -> "at or after"
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    filled = both.select(
        "*",
        *[
            pick(c + suffix).over(w).alias(c + suffix + "_f")
            for c in value_cols
        ],
        pick(F.when(F.col("_side") == 0, ts_seconds(ts)))
        .over(w)
        .alias("_rts"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        gap = (
            ts_seconds(ts) - F.col("_rts")
            if direction == "backward"
            else F.col("_rts") - ts_seconds(ts)
        )
        keep = gap <= F.lit(float(tolerance_sec))
        out = out.select(
            "*",
            *[
                F.when(keep, F.col(c + suffix + "_f")).alias(c + suffix + "_t")
                for c in value_cols
            ],
        )
        final_cols = [c + suffix + "_t" for c in value_cols]
    else:
        final_cols = [c + suffix + "_f" for c in value_cols]
    return out.select(
        *left.columns,
        *[F.col(fc).alias(vc + suffix) for fc, vc in zip(final_cols, value_cols)],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None,
    tolerance_sec: float | None,
    suffix: str,
) -> DataFrame:
    """direction='nearest': the closer of the at-or-before and
    at-or-after right rows, ties to the earlier (backward) one.

    Same union-window shape as the directional joins — ONE shuffle on
    key carries both passes (two sorts share the exchange). Gap
    comparison is exact integer microseconds (epoch_us), not float
    seconds: a µs-level tie must break identically on every engine,
    and doubles at epoch magnitude only resolve ~0.24 µs.
    """
    from tits_spark.functions.exprs import epoch_us

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        key, ts, *[F.col(c).alias(c + suffix) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    both = lhs.unionByName(rhs, allowMissingColumns=True)

    wb = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    r_us = F.when(F.col("_side") == 0, epoch_us(ts))
    filled = both.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(wb).alias(c + "_b")
            for c in value_cols
        ],
        *[
            F.first(c + suffix, ignorenulls=True).over(wf).alias(c + "_f")
            for c in value_cols
        ],
        F.last(r_us, ignorenulls=True).over(wb).alias("_bus"),
        F.first(r_us, ignorenulls=True).over(wf).alias("_fus"),
    ).filter(F.col("_side") == 1)

    l_us = epoch_us(ts)
    bgap, fgap = l_us - F.col("_bus"), F.col("_fus") - l_us
    take_b = F.col("_fus").isNull() | (F.col("_bus").isNotNull() & (bgap <= fgap))
    gap = F.when(take_b, bgap).otherwise(fgap)
    if tolerance_sec is not None:
        gap = F.when(gap <= F.lit(int(round(tolerance_sec * 1_000_000))), gap)
    chosen = filled.select(
        "*",
        gap.alias("_gap_us"),
        *[
            F.when(take_b, F.col(c + "_b")).otherwise(F.col(c + "_f")).alias(c + "_n")
            for c in value_cols
        ],
    )
    return chosen.select(
        *left.columns,
        *[
            F.when(F.col("_gap_us").isNotNull(), F.col(c + "_n")).alias(c + suffix)
            for c in value_cols
        ],
        F.col("_gap_us").alias("asof_gap_us"),
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Same semantics via cogrouped pd.merge_asof."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{c}{suffix}` {right.schema[c].dataType.simpleString()}"
            for c in value_cols
        ]
    )

    def fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=list(l.columns) + [c + suffix for c in value_cols])
        l = l.sort_values(ts, kind="stable")
        r = r.sort_values(ts, kind="stable")[[ts, *value_cols]].rename(
            columns={c: c + suffix for c in value_cols}
        )
        tol = pd.Timedelta(seconds=tolerance_sec) if tolerance_sec is not None else None
        merged = pd.merge_asof(l, r, on=ts, direction="backward", tolerance=tol)
        return merged

    # numbered repartition on both children: per-key merge_asof is
    # CPU-bound, so AQE's byte-based coalescing would serialize it
    # (grouped-UDF trap, BENCH/PLANS.md); identical (keys, count) hash
    # partitioning satisfies the cogroup distribution on both sides —
    # no second shuffle.
    nparts = left.sparkSession.sparkContext.defaultParallelism
    return (
        left.repartition(nparts, key).groupBy(key)
        .cogroup(right.repartition(nparts, key).groupBy(key))
        .applyInPandas(fn, schema=out_schema)
    )
