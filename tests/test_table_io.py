"""TableIO backend resolution + parquet-layout contract (SURVEY.md §7).

The Iceberg backend cannot be driven here (no iceberg-spark-runtime jar
in the container — that absence is itself asserted), so these tests pin
(a) correct backend selection logic and (b) the parquet backend's
idempotent dynamic-overwrite semantics that the lineage commit protocol
relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.sources.table_io import (
    IcebergTableIO,
    ParquetTableIO,
    iceberg_available,
    is_table_identifier,
    resolve_table_io,
)


def test_identifier_detection():
    assert is_table_identifier("db.tiers")
    assert is_table_identifier("catalog.db.tiers")
    assert not is_table_identifier("/data/tiers")
    assert not is_table_identifier("data/tiers")
    assert not is_table_identifier("tiers")  # single part: ambiguous, treat as dir
    assert not is_table_identifier("a.b.c.d")
    assert not is_table_identifier("db.1bad")


def test_resolution_falls_back_without_iceberg(spark, tmp_path):
    # this container ships no Iceberg runtime — resolution must fall
    # back to parquet even for a dotted identifier
    assert not iceberg_available(spark)
    io = resolve_table_io(spark, "catalog.db.tiers", "catalog.db.metrics")
    assert isinstance(io, ParquetTableIO)
    io2 = resolve_table_io(spark, str(tmp_path / "tiers"), str(tmp_path / "m"))
    assert isinstance(io2, ParquetTableIO)


def test_parquet_tier_overwrite_is_per_day(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path / "tiers"), str(tmp_path / "metrics"))
    df1 = spark.createDataFrame(
        [("k1", "2026-01-01 10:00:00", 1, 5.0), ("k1", "2026-01-02 10:00:00", 1, 7.0)],
        "key string, bucket_ts string, n_obs long, v_sum double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    io.write_tier(df1, "1h")
    assert io.tier_partition_count("1h") == 2

    # rewrite ONLY day 1 with a new value; day 2 must survive untouched
    df2 = spark.createDataFrame(
        [("k1", "2026-01-01 10:00:00", 2, 9.0)],
        "key string, bucket_ts string, n_obs long, v_sum double",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    io.write_tier(df2, "1h")
    got = {
        (r["key"], str(r["bucket_date"])): (r["n_obs"], r["v_sum"])
        for r in io.read_tier("1h").collect()
    }
    assert got[("k1", "2026-01-01")] == (2, 9.0)
    assert got[("k1", "2026-01-02")] == (1, 7.0)


def test_metrics_log_append_and_first_read(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path / "t"), str(tmp_path / "metrics"))
    assert io.read_metrics().count() == 0  # missing dir -> empty frame
    rows = spark.createDataFrame(
        [("j1", "tier_1m", "2026-01-01", 10, 3, 42, None)],
        "job_id string, stage string, part string, input_count long, "
        "bucket_count long, checksum long, committed_at timestamp",
    )
    io.append_metrics(rows)
    io.append_metrics(rows)
    assert io.read_metrics().count() == 2


def test_iceberg_table_names():
    io = IcebergTableIO.__new__(IcebergTableIO)
    io.prefix = "cat.db.tiers"
    io.metrics_table = "cat.db.tiers_metrics"
    assert io._tier_table("1h") == "cat.db.tiers_1h"
