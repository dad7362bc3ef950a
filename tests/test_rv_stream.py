"""Streaming realized vol: finalized buckets must equal the batch
operator on closed buckets, including non-positive prints dropped
pre-lag and incremental micro-batch restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.returns import log_returns, realized_vol

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    """Subset of users, with every 17th event turned into a
    non-positive print (both paths must drop it before lagging)."""
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_id") % 17 == 0, -F.col("value")).otherwise(
            F.col("value")
        ).alias("value"),
    ).filter(F.col("key").isin("1", "2", "3", "4"))


def _closed_batch(ev, bucket_secs):
    """Batch RV restricted to buckets strictly before each key's last
    POSITIVE sample's bucket (the only ones a stream can finalize)."""
    out = realized_vol(log_returns(ev, "key", "ts", "value"), "1h")
    last = (
        ev.filter(F.col("value") > 0)
        .groupBy("key")
        .agg(F.max("ts").alias("mx"))
        .select("key", F.expr(f"CAST(mx AS LONG) DIV {bucket_secs}").alias("last_b"))
    )
    return (
        out.join(last, "key")
        .filter(F.expr(f"CAST(bucket_ts AS LONG) DIV {bucket_secs}") < F.col("last_b"))
        .select(
            "key", "bucket_ts", "n_ret",
            F.round("rv", 9).alias("rv"),
            F.round("r_sum", 9).alias("r_sum"),
            F.round("r_min", 9).alias("r_min"),
            F.round("r_max", 9).alias("r_max"),
        )
    )


def _stream_out(spark, out):
    return spark.read.parquet(out).select(
        "key", "bucket_ts", "n_ret",
        F.round("rv", 9).alias("rv"),
        F.round("r_sum", 9).alias("r_sum"),
        F.round("r_min", 9).alias("r_min"),
        F.round("r_max", 9).alias("r_max"),
    )


def test_stream_rv_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.rv_stream import stream_realized_vol

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_realized_vol(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev, 3600)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_rv_carries_state_across_batches(spark, events, tmp_path):
    from tits_spark.streaming.rv_stream import stream_realized_vol

    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    mid = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode("overwrite").parquet(src)
    stream_realized_vol(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    n_first = spark.read.parquet(out).count()
    ev.filter(F.col("ts").cast("double") > mid).write.mode("append").parquet(src)
    stream_realized_vol(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    assert got.count() > n_first
    want = _closed_batch(ev, 3600)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
