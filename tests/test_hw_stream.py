"""Streaming Holt-Winters ≡ batch holt_winters, bit for bit, incl.
restarts that split a key's INIT buffer across phases."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.smoothing import holt_winters
from tits_spark.streaming.hw_stream import stream_holt_winters

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _norm(df):
    u6 = lambda c: F.floor(F.col(c) * 1e6).cast("long").alias(c)  # noqa: E731
    return df.select(
        "key", "idx", "value",
        u6("fitted"), u6("level"), u6("trend"), u6("seasonal"),
    )


def test_stream_hw_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_holt_winters(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(holt_winters(ev))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_hw_restart_mid_init(spark, events, tmp_path):
    """First phase delivers FEWER than 2*period samples for some keys
    (init buffer must survive the restart), then two more phases."""
    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events).withColumn(
        "_r",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("key").orderBy("ts", "value")
        ),
    )
    ev.filter(F.col("_r") <= 5).drop("_r").write.mode("overwrite").parquet(src)
    stream_holt_winters(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("_r") > 5) & (F.col("_r") <= 20)).drop("_r").write.mode(
        "append").parquet(src)
    stream_holt_winters(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("_r") > 20).drop("_r").write.mode("append").parquet(src)
    stream_holt_winters(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(holt_winters(_ev(events)))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
