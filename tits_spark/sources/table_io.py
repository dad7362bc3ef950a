"""Tier/metrics table storage backends (SURVEY.md §7 TableIO).

The north rule targets Iceberg tables of transcripts. This sandbox has
no iceberg-spark-runtime jar, so the parquet-directory backend is the
tested default; the Iceberg backend activates only when BOTH hold:

 - the location string is a dotted table identifier
   (``catalog.db.table_prefix``), not a filesystem path, and
 - ``org.apache.iceberg.spark.SparkCatalog`` resolves on the JVM
   classpath (i.e. the deploy shipped the Iceberg runtime).

Both backends expose the same contract, so `tits_spark.lineage` and the
spark-submit jobs are storage-agnostic:

 - ``read_tier(tier)`` / ``write_tier(df, tier, files_per_day)`` —
   idempotent per-day replace: parquet uses dynamic partition
   overwrite, Iceberg uses ``writeTo().overwritePartitions()`` (the
   same replace-matching-partitions semantics, transactional).
 - ``tier_partition_count(tier)`` — number of day partitions on disk.
 - ``read_metrics()`` / ``append_metrics(df)`` — append-only lineage
   log. On parquet the log doubles as the commit protocol (a partition
   is visible iff its lineage row exists — exactly-once on top of
   idempotent overwrites); on Iceberg each append is a table commit.

Rows are clustered onto (bucket_date, salt) before every tier write so
each output file is written whole by one task — no tasks-x-dates sliver
files; ``files_per_day`` sizes files at cluster scale (~128MB-1GB each).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "job_id string, stage string, part string, input_count long, "
    "bucket_count long, checksum long, committed_at timestamp"
)

_IDENT_RE = re.compile(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*){1,2}")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound via py4j
        return False


def is_table_identifier(location: str) -> bool:
    """Dotted table identifier (``db.table`` / ``cat.db.table``) vs path."""
    return "/" not in location and bool(_IDENT_RE.fullmatch(location))


def _cluster_for_write(df: DataFrame, files_per_day: int) -> DataFrame:
    out = df.withColumn("bucket_date", F.to_date("bucket_ts"))
    if files_per_day <= 1:
        return out.repartition("bucket_date")
    return out.repartition(
        F.col("bucket_date"), F.pmod(F.xxhash64("key"), F.lit(files_per_day))
    )


class ParquetTableIO:
    """Parquet directory layout: ``<root>/tier=<t>/bucket_date=<d>/``
    plus an append-only parquet metrics log."""

    def __init__(self, spark: SparkSession, tiers_root: str, metrics_root: str):
        self.spark = spark
        self.tiers_root = tiers_root
        self.metrics_root = metrics_root

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.tiers_root}/tier={tier}")

    def write_tier(self, df: DataFrame, tier: str, files_per_day: int = 1) -> None:
        (
            _cluster_for_write(df, files_per_day)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_date")
            .parquet(f"{self.tiers_root}/tier={tier}")
        )

    def tier_partition_count(self, tier: str) -> int:
        import glob

        return len(glob.glob(f"{self.tiers_root}/tier={tier}/bucket_date=*"))

    def read_metrics(self) -> DataFrame:
        try:
            return self.spark.read.schema(METRICS_SCHEMA).parquet(self.metrics_root)
        except Exception:  # noqa: BLE001 — missing dir on first run
            return self.spark.createDataFrame([], METRICS_SCHEMA)

    def append_metrics(self, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self.metrics_root)


class IcebergTableIO:
    """Iceberg catalog tables ``<prefix>_<tier>`` + ``<prefix>_metrics``.

    Writes are transactional table commits; ``overwritePartitions``
    replaces exactly the day partitions present in the frame, matching
    the parquet backend's dynamic-overwrite idempotency. Requires
    iceberg-spark-runtime on the classpath (see iceberg_available)."""

    def __init__(self, spark: SparkSession, table_prefix: str,
                 metrics_table: str | None = None):
        self.spark = spark
        self.prefix = table_prefix
        self.metrics_table = metrics_table or f"{table_prefix}_metrics"

    def _tier_table(self, tier: str) -> str:
        return f"{self.prefix}_{tier}"

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.table(self._tier_table(tier))

    def write_tier(self, df: DataFrame, tier: str, files_per_day: int = 1) -> None:
        out = _cluster_for_write(df, files_per_day)
        name = self._tier_table(tier)
        writer = out.writeTo(name).using("iceberg").partitionedBy(F.col("bucket_date"))
        if self.spark.catalog.tableExists(name):
            out.writeTo(name).overwritePartitions()
        else:
            writer.create()

    def tier_partition_count(self, tier: str) -> int:
        return (
            self.spark.table(f"{self._tier_table(tier)}.partitions").count()
        )

    def read_tier_as_of(self, tier: str, as_of) -> DataFrame:
        """Native Iceberg snapshot time travel (true snapshot
        isolation — old file versions are retained by the table)."""
        return (
            self.spark.read.format("iceberg")
            .option("as-of-timestamp", str(int(as_of.timestamp() * 1000)))
            .load(self._tier_table(tier))
        )

    def read_metrics(self) -> DataFrame:
        if not self.spark.catalog.tableExists(self.metrics_table):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.table(self.metrics_table)

    def append_metrics(self, rows: DataFrame) -> None:
        if self.spark.catalog.tableExists(self.metrics_table):
            rows.writeTo(self.metrics_table).append()
        else:
            rows.writeTo(self.metrics_table).using("iceberg").create()


def resolve_table_io(
    spark: SparkSession, tiers_location: str, metrics_location: str
) -> ParquetTableIO | IcebergTableIO:
    """Pick the backend from the location shape + classpath: dotted
    identifiers with an Iceberg runtime -> IcebergTableIO, anything
    else -> the parquet directory layout."""
    if is_table_identifier(tiers_location) and iceberg_available(spark):
        return IcebergTableIO(spark, tiers_location, metrics_location)
    return ParquetTableIO(spark, tiers_location, metrics_location)
