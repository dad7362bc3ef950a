"""Continuously-maintained per-bucket value histograms (foreachBatch).

The quantile member of the continuous-aggregate families. Histograms
merge by ADDING counts — and additive merges are NOT replay-idempotent
(foreachBatch is at-least-once: a replayed micro-batch would double-
count), so this stream uses the opposite device from the HLL register
stream (streaming/distinct_stream.py, whose max-merge is idempotent
for free): each micro-batch writes its histogram DELTA into its own
``batch_id=<id>`` partition with dynamic overwrite. A replay rewrites
the same partition bit-for-bit instead of double-counting — the same
exactly-once-on-top-of-at-least-once construction as the decontam gate
(streaming/decontam_stream.py:54).

Readers aggregate the deltas (sum over batch_id) — cheap, since each
delta is at most (buckets x lattice points) rows; :func:`compact`
folds committed deltas into a single base partition when the delta
count grows (run it from the maintenance window that owns the table —
it must not race the writer, same single-writer assumption as the
register table's dynamic overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tits_spark.operators.quantiles import value_histogram

#: batch_id of the compacted base partition (real batch ids are >= 0)
BASE_PARTITION = -1


def write_hist_delta(
    batch: DataFrame, table_path: str, batch_id: int, tier_unit: str,
    ts: str, value: str, scale: int,
) -> None:
    spark = batch.sparkSession
    hist = value_histogram(
        batch.select(F.date_trunc(tier_unit, ts).alias("bucket_ts"), value),
        ["bucket_ts"], value, scale,
    ).withColumn("batch_id", F.lit(batch_id))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    hist.write.mode("overwrite").partitionBy("batch_id").parquet(table_path)


def read_histogram(spark: SparkSession, table_path: str) -> DataFrame:
    """The merged (bucket_ts, q, cnt) histogram across all deltas."""
    return (
        spark.read.parquet(table_path)
        .groupBy("bucket_ts", "q")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact(spark: SparkSession, table_path: str) -> None:
    """Fold every delta into the base partition. Single-writer: must
    not run concurrently with the stream (maintenance window)."""
    merged = read_histogram(spark, table_path).withColumn(
        "batch_id", F.lit(BASE_PARTITION)
    )
    # static overwrite replaces ALL partitions with the single base
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(table_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def stream_histogram(
    spark: SparkSession,
    source_path: str,
    schema: str,
    table_path: str,
    checkpoint: str,
    tier_unit: str = "minute",
    ts: str = "ts",
    value: str = "value",
    scale: int = 100,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream (ts, value, ...) parquet into per-bucket histogram
    deltas; read quantiles at any time with
    ``quantiles_from_hist(read_histogram(spark, table_path), ...)``."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        write_hist_delta(batch, table_path, batch_id, tier_unit, ts, value, scale)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch to N source files (soak harness device,
        # tools/stream_soak.py: availableNow then drains as many batches)
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(source_path)
    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
