"""Bucketed (pre-shuffled) tables: co-located joins without a runtime
exchange.

At 10^12 turns, the recurring joins of the pipeline — turns-to-turns
as-of alignment, series-pair correlation, lineage anti-joins — all key
on ``conv_id``. Shuffling the fact table for every join is the single
biggest avoidable cost at that scale; Spark's bucketed tables move that
shuffle to WRITE time, once: ``bucketBy(n, key)`` hash-partitions rows
into a fixed bucket layout recorded in the catalog, and a join of two
tables bucketed the same way (same column, same count) is planned as a
zipped SortMergeJoin with NO Exchange on either side
(tests/test_bucketed.py asserts exactly that).

This is the static complement to the dynamic tools in operators.skew:
bucketing fixes the partitioning of the big stable tables; salting +
AQE handle the skewed/one-off paths.

Bucketed writes go through the session catalog (`saveAsTable`) because
the bucket spec lives in table metadata, not in the parquet files —
plain ``.parquet()`` writes cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table keyed on ``key``. Sorting within buckets lets the
    join skip its per-task sort too (plain SMJ without Sort nodes when
    both sides are sorted the same way)."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables. With matching bucket specs
    Catalyst plans this with zero Exchange operators — each task reads
    bucket i of both sides locally."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
