"""Streaming stochastic %K/%D/%R + OBV: finalized bars must equal the
batch stochastic operator on closed bars, bit for bit, incl. restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.bars import bars_from_tier, stochastic
from tits_spark.operators.rollup import rollup_from_raw
from tits_spark.streaming.stoch_stream import stream_stochastic

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4"))


def _closed_batch(ev):
    tier = rollup_from_raw(ev, "key", "ts", "value", "1h")
    out = stochastic(bars_from_tier(tier), n=14, d=3)
    last = ev.groupBy("key").agg(F.max("ts").alias("mx"))
    lastb = last.select(
        "key", F.expr("CAST(mx AS LONG) DIV 3600").alias("last_b")
    )
    return (
        out.join(lastb, "key")
        .filter(F.expr("CAST(bucket_ts AS LONG) DIV 3600") < F.col("last_b"))
        .select("key", "bucket_ts", "close", "pct_k", "pct_d", "pct_r",
                "obv", "n_win")
    )


def _stream_out(spark, out):
    return spark.read.parquet(out).select(
        "key", "bucket_ts", "close", "pct_k", "pct_d", "pct_r", "obv", "n_win"
    )


def test_stream_stochastic_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_stochastic(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_stochastic_across_restarts(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    qs = ev.agg(F.expr(
        "percentile(CAST(ts AS DOUBLE), array(0.35, 0.7))").alias("q")).first().q
    lo, hi = qs
    ev.filter(F.col("ts").cast("double") <= lo).write.mode("overwrite").parquet(src)
    stream_stochastic(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    ev.filter((F.col("ts").cast("double") > lo)
              & (F.col("ts").cast("double") <= hi)).write.mode("append").parquet(src)
    stream_stochastic(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    ev.filter(F.col("ts").cast("double") > hi).write.mode("append").parquet(src)
    stream_stochastic(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    assert got.count() > n1
    want = _closed_batch(ev)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
