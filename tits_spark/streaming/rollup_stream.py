"""Structured Streaming front-end for the rollup engine.

The reference processes an unbounded stdin stream with bounded per-key
state (ref:guess_lag.c:349-352, SURVEY.md §2.10); our batch engine is
the primary path (continuous aggregates + checkpoint resume), and this
module is the streaming wrapper: readStream -> watermarked 1m windowed
aggregation -> foreachBatch append into the same tier layout, so late
data within the watermark lands in the right bucket and the downstream
cascade (1h/1d) stays exact.

The aggregate set matches operators.rollup bit-for-bit: count/sum/sumsq/
min/max and min_by/max_by on the observation timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_rollup_1m(
    spark: SparkSession,
    source_path: str,
    schema: str,
    out_path: str,
    checkpoint: str,
    key: str = "conv_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream a parquet directory into the 1m tier.

    Watermark bounds state: buckets older than (max event time -
    watermark) are finalized and emitted once (append mode), matching
    the batch tier exactly for on-time data; later-than-watermark rows
    are dropped — the documented streaming trade-off the batch
    checkpoint path does not have.
    """
    v, t = F.col(value), F.col(ts)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = (
        reader.parquet(source_path)
        .withWatermark(ts, watermark)
        .groupBy(F.col(key).alias("key"), F.window(ts, "1 minute").alias("w"))
        .agg(
            F.count(v).alias("n_obs"),
            F.sum(v).alias("v_sum"),
            F.sum(v * v).alias("v_sumsq"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, t).alias("v_first"),
            F.max_by(v, t).alias("v_last"),
            F.min(t).alias("first_ts"),
            F.max(t).alias("last_ts"),
        )
        .select("key", F.col("w.start").alias("bucket_ts"), "n_obs", "v_sum",
                "v_sumsq", "v_min", "v_max", "v_first", "v_last",
                "first_ts", "last_ts")
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn("bucket_date", F.to_date("bucket_ts"))
            .repartition("bucket_date")
            .write.mode("append")
            .partitionBy("bucket_date")
            .parquet(f"{out_path}/tier=1m")
        )

    writer = stream.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint
    ).foreachBatch(sink)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
