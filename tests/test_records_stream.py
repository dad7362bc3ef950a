"""Streaming record extraction ≡ batch record_highs, incl. restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.olap import record_highs
from tits_spark.streaming.records_stream import stream_record_highs

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _norm(df):
    return df.select("key", "ts", "value", "record_idx", "us_since_prev")


def test_stream_records_match_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_record_highs(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(record_highs(ev))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_records_across_restarts(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    qs = ev.agg(F.expr(
        "percentile(CAST(ts AS DOUBLE), array(0.3, 0.65))").alias("q")).first().q
    lo, hi = qs
    ev.filter(F.col("ts").cast("double") <= lo).write.mode("overwrite").parquet(src)
    stream_record_highs(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("ts").cast("double") > lo)
              & (F.col("ts").cast("double") <= hi)).write.mode("append").parquet(src)
    stream_record_highs(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("ts").cast("double") > hi).write.mode("append").parquet(src)
    stream_record_highs(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(record_highs(ev))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
