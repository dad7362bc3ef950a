"""Streaming Kalman ≡ batch kalman_local_level, bit for bit, incl. a
3-phase restart that splits keys' series across checkpointed runs."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.kalman import kalman_local_level
from tits_spark.streaming.kalman_stream import stream_kalman

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _norm(df):
    u6 = lambda c: F.floor(F.col(c) * 1e6).cast("long").alias(c)  # noqa: E731
    return df.select("key", "ts", u6("level"), u6("gain"), u6("p_var"))


def test_stream_kalman_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_kalman(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(kalman_local_level(ev))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_kalman_restart_bit_equal(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    ev = _ev(events).withColumn(
        "_r", F.row_number().over(Window.partitionBy("key").orderBy("ts", "value"))
    )
    ev.filter(F.col("_r") <= 3).drop("_r").write.mode("overwrite").parquet(src)
    stream_kalman(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("_r") > 3) & (F.col("_r") <= 25)).drop("_r").write.mode(
        "append"
    ).parquet(src)
    stream_kalman(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("_r") > 25).drop("_r").write.mode("append").parquet(src)
    stream_kalman(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(kalman_local_level(_ev(events)))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
