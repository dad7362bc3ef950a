"""Data-quality profiling: per-column completeness, distinctness, and
extrema in ONE pass over the table.

The standard pre-training data gate (the Deequ/Great-Expectations
shape): before a 100 TB corpus feeds a pipeline, every column gets
row count, null count, exact distinct count, and min/max. Spark-first
formulation: a single wide aggregate — one job, one scan, partial+final
for everything except the exact count(DISTINCT), which Spark plans as
its standard two-phase expand (one extra exchange, still no driver
collect of data). Output is long format (one row per column, values
rendered to strings) so heterogeneous column types coexist in one
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def data_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_s, max_s) per column.

    min/max are rendered with CAST(x AS STRING) — exact for integers
    and strings; floats use Spark's shortest-roundtrip rendering (same
    convention either side of the oracle gate). NULL-only columns
    render NULL extrema. ``n_distinct`` counts non-null distincts.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) as (col_name, n_rows, n_null, n_distinct, min_s, max_s)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', {c}__n, {c}__null, {c}__dist, {c}__min, {c}__max"
                    for c in cols
                ),
            )
        )
    )
    return stacked
