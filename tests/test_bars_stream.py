"""Streaming OHLC+indicator bars: finalized bars must equal the batch
atr_rsi operator on closed bars, bit for bit, including restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.bars import atr_rsi, bars_from_tier
from tits_spark.operators.rollup import rollup_from_raw

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4"))


def _closed_batch(ev):
    """Batch bars+indicators restricted to buckets strictly before each
    key's last sample bucket (the only bars a stream can finalize)."""
    tier = rollup_from_raw(ev, "key", "ts", "value", "1h")
    out = atr_rsi(bars_from_tier(tier), n=14)
    last = ev.groupBy("key").agg(F.max("ts").alias("mx"))
    lastb = last.select(
        "key", F.expr("CAST(mx AS LONG) DIV 3600").alias("last_b")
    )
    return (
        out.join(lastb, "key")
        .filter(F.expr("CAST(bucket_ts AS LONG) DIV 3600") < F.col("last_b"))
        .select(
            "key", "bucket_ts", "open", "high", "low", "close",
            "n_obs", "tr", "atr", "rsi", "n_win",
        )
    )


def _stream_out(spark, out):
    return spark.read.parquet(out).select(
        "key", "bucket_ts", "open", "high", "low", "close",
        "n_obs", "tr", "atr", "rsi", "n_win",
    )


def test_stream_bars_match_batch(spark, events, tmp_path):
    from tits_spark.streaming.bars_stream import stream_bars_atr_rsi

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_bars_atr_rsi(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_bars_across_restarts(spark, events, tmp_path):
    from tits_spark.streaming.bars_stream import stream_bars_atr_rsi

    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    mid = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode("overwrite").parquet(src)
    stream_bars_atr_rsi(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    n_first = spark.read.parquet(out).count()
    ev.filter(F.col("ts").cast("double") > mid).write.mode("append").parquet(src)
    stream_bars_atr_rsi(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    assert got.count() > n_first
    want = _closed_batch(ev)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_bars_three_phase_restart(spark, events, tmp_path):
    """Three incremental arrivals split at uneven quantiles: the ring
    buffers and open-bar partials must survive two restarts."""
    from tits_spark.streaming.bars_stream import stream_bars_atr_rsi

    src, out, ckpt = (str(tmp_path / d) for d in ("3src", "3out", "3ckpt"))
    ev = _ev(events)
    q1, q2 = (
        ev.agg(
            F.expr("percentile(CAST(ts AS DOUBLE), 0.3)"),
            F.expr("percentile(CAST(ts AS DOUBLE), 0.8)"),
        ).first()
    )
    t = F.col("ts").cast("double")
    parts = [ev.filter(t <= q1), ev.filter((t > q1) & (t <= q2)), ev.filter(t > q2)]
    for i, p in enumerate(parts):
        p.write.mode("overwrite" if i == 0 else "append").parquet(src)
        stream_bars_atr_rsi(
            spark, src, SCHEMA, out, ckpt, bucket_secs=3600
        ).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
