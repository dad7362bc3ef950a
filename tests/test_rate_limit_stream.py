"""Streaming rate limiter ≡ batch replay, bit for bit (pure integer
state), incl. a 3-phase restart splitting throttle windows."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.rate_limit import rate_limit_replay
from tits_spark.streaming.rate_limit_stream import stream_rate_limit

SCHEMA = "key string, eid long, ts timestamp"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("eid"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def test_stream_rate_limit_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_rate_limit(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    want = rate_limit_replay(ev, capacity=2, rate_per_hour=1)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_rate_limit_restart_bit_equal(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    ev = _ev(events).withColumn(
        "_r", F.row_number().over(Window.partitionBy("key").orderBy("ts", "eid"))
    )
    ev.filter(F.col("_r") <= 4).drop("_r").write.mode("overwrite").parquet(src)
    stream_rate_limit(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("_r") > 4) & (F.col("_r") <= 20)).drop("_r").write.mode(
        "append"
    ).parquet(src)
    stream_rate_limit(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("_r") > 20).drop("_r").write.mode("append").parquet(src)
    stream_rate_limit(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    want = rate_limit_replay(_ev(events), capacity=2, rate_per_hour=1)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
