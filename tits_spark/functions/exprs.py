"""Small column-expression helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def ts_seconds(c: Column | str) -> Column:
    """Timestamp (TZ or NTZ) -> epoch seconds as double, µs precision.

    Parquet timestamps may load as TIMESTAMP_NTZ in Spark 4, which can't
    cast to double directly; go through TIMESTAMP (session tz is pinned
    to UTC in tits_spark.session).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")
