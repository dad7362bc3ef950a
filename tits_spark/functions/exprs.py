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


def epoch_us(c: Column | str) -> Column:
    """Timestamp -> integer epoch microseconds (exact; goes through the
    same TZ-safe double cast as ts_seconds)."""
    return (ts_seconds(c) * 1_000_000).cast("long")


def floordiv(col: Column, divisor: int | Column) -> Column:
    """Integer FLOOR division of a long column by a positive divisor
    (literal int or positive long column).

    Spark's `DIV` truncates toward zero, which disagrees with floor
    (and with DuckDB's `//` and numpy's `//`) for negative values —
    pre-1970 timestamps would otherwise land in the wrong bucket.

    Exactness bound: |col| and the quotient must stay below 2**53 so
    the final double division of the exact multiple is lossless."""
    d = F.lit(int(divisor)) if isinstance(divisor, int) else divisor
    # (col - mod) / d with a non-negative mod == floor division; the
    # double division is exact because col - m is an exact multiple of
    # d and the true quotient is a representable integer
    m = ((col % d) + d) % d
    return ((col - m) / d).cast("long")
