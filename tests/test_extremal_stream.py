"""Streaming extremal-index state ≡ batch extremal_index on the exact
integer surface (n_exc, u_cents, sum_t, sum_t2), incl. restarts and
out-of-order arrival."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.extremal import extremal_index
from tits_spark.streaming.extremal_stream import stream_extremal_index

SCHEMA = "key string, ts timestamp, value double"
K = 12  # small k so sf0.001 keys have plenty of exceedance turnover


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _last_emissions(spark, out):
    # the monotone n_seen counter recovers the final emission per key
    # from unordered parquet part files
    df = spark.read.parquet(out)
    w = Window.partitionBy("key").orderBy(F.desc("n_seen"))
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") == 1) & (F.col("n_exc") == K))
        .select("key", "n_exc", "u_cents", "sum_t", "sum_t2")
    )


def _want(ev):
    return extremal_index(ev, k=K).select(
        "key", "n_exc", "u_cents", "sum_t", "sum_t2"
    )


def test_stream_extremal_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_extremal_index(spark, src, SCHEMA, out, ckpt, k=K).awaitTermination(300)
    got = _last_emissions(spark, out)
    want = _want(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_extremal_across_restarts_out_of_order(spark, events, tmp_path):
    """Three phases split by VALUE (not time!) — phase 1 feeds mid
    values, phase 2 the largest, phase 3 the smallest, so exceedance
    candidates arrive wildly out of time order and the top-k set must
    churn correctly across two restarts."""
    src, out, ckpt = (str(tmp_path / d) for d in ("vsrc", "vout", "vckpt"))
    ev = _ev(events)
    lo, hi = ev.agg(
        F.expr("percentile(value, array(0.5, 0.9))").alias("q")
    ).first().q
    p1 = ev.filter((F.col("value") > lo) & (F.col("value") <= hi))
    p2 = ev.filter(F.col("value") > hi)
    p3 = ev.filter(F.col("value") <= lo)
    p1.write.mode("overwrite").parquet(src)
    stream_extremal_index(spark, src, SCHEMA, out, ckpt, k=K).awaitTermination(300)
    p2.write.mode("append").parquet(src)
    stream_extremal_index(spark, src, SCHEMA, out, ckpt, k=K).awaitTermination(300)
    p3.write.mode("append").parquet(src)
    stream_extremal_index(spark, src, SCHEMA, out, ckpt, k=K).awaitTermination(300)
    got = _last_emissions(spark, out)
    want = _want(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
