"""Streaming TWA: finalized buckets must equal the batch operator on
closed buckets, including across incremental micro-batch restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.timeweight import time_weighted_avg

SCHEMA = "key string, ts timestamp, value double"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4"))


def _closed_batch(ev, bucket_secs, max_gap_sec=None):
    """Batch TWA restricted to buckets strictly before each key's last
    event bucket (the only ones a stream can have finalized)."""
    out = time_weighted_avg(
        ev, key_col="key", bucket_secs=bucket_secs, max_gap_sec=max_gap_sec
    )
    last = ev.groupBy("key").agg(F.max("ts").alias("mx"))
    lastb = last.select(
        "key",
        F.expr(f"CAST(mx AS LONG) DIV {bucket_secs}").alias("last_b"),
    )
    return (
        out.join(lastb, "key")
        .filter(F.expr(f"CAST(bucket_ts AS LONG) DIV {bucket_secs}") < F.col("last_b"))
        .select("key", "bucket_ts", F.round("twa", 9).alias("twa"),
                F.round("covered_sec", 6).alias("covered_sec"))
    )


def _stream_out(spark, out):
    return spark.read.parquet(out).select(
        "key", "bucket_ts", F.round("twa", 9).alias("twa"),
        F.round("covered_sec", 6).alias("covered_sec"),
    )


def test_stream_twa_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.twa_stream import stream_twa

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_twa(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev, 3600)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_twa_max_gap_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.twa_stream import stream_twa

    src, out, ckpt = (str(tmp_path / d) for d in ("gsrc", "gout", "gckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_twa(
        spark, src, SCHEMA, out, ckpt, bucket_secs=3600, max_gap_sec=7200
    ).awaitTermination(300)
    got = _stream_out(spark, out)
    want = _closed_batch(ev, 3600, max_gap_sec=7200)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def _closed_counter_batch(ev, bucket_secs):
    from tits_spark.operators.timeweight import counter_rate

    out = counter_rate(ev, key_col="key", bucket_secs=bucket_secs)
    last = ev.groupBy("key").agg(F.max("ts").alias("mx"))
    lastb = last.select(
        "key", F.expr(f"CAST(mx AS LONG) DIV {bucket_secs}").alias("last_b")
    )
    return (
        out.join(lastb, "key")
        .filter(F.expr(f"CAST(bucket_ts AS LONG) DIV {bucket_secs}") < F.col("last_b"))
        .select("key", "bucket_ts", F.round("increase", 9).alias("increase"),
                F.round("rate_per_sec", 9).alias("rate_per_sec"),
                "n_samples", "n_resets")
    )


def test_stream_counter_rate_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.counter_stream import stream_counter_rate

    src, out, ckpt = (str(tmp_path / d) for d in ("csrc", "cout", "cckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_counter_rate(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = spark.read.parquet(out).select(
        "key", "bucket_ts", F.round("increase", 9).alias("increase"),
        F.round("rate_per_sec", 9).alias("rate_per_sec"), "n_samples", "n_resets"
    )
    want = _closed_counter_batch(ev, 3600)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_counter_rate_across_batches(spark, events, tmp_path):
    from tits_spark.streaming.counter_stream import stream_counter_rate

    src, out, ckpt = (str(tmp_path / d) for d in ("c2src", "c2out", "c2ckpt"))
    ev = _ev(events)
    mid = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode("overwrite").parquet(src)
    stream_counter_rate(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    ev.filter(F.col("ts").cast("double") > mid).write.mode("append").parquet(src)
    stream_counter_rate(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = spark.read.parquet(out).select(
        "key", "bucket_ts", F.round("increase", 9).alias("increase"),
        F.round("rate_per_sec", 9).alias("rate_per_sec"), "n_samples", "n_resets"
    )
    want = _closed_counter_batch(ev, 3600)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_twa_carries_state_across_batches(spark, events, tmp_path):
    """Split the input at a global mid-timestamp, run the stream twice
    incrementally: the union of emissions must still equal the batch
    result over the FULL history (open segments and open-bucket partials
    crossed the restart via state)."""
    from tits_spark.streaming.twa_stream import stream_twa

    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    mid = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode("overwrite").parquet(src)
    stream_twa(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    n_first = spark.read.parquet(out).count()
    ev.filter(F.col("ts").cast("double") > mid).write.mode("append").parquet(src)
    stream_twa(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    got = _stream_out(spark, out)
    assert got.count() > n_first
    want = _closed_batch(ev, 3600)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_twa_counts_late_rows(spark, tmp_path):
    """An event older than the carried segment start is an ordering
    violation: it must be COUNTED on the emitted rows (n_late_total),
    not silently vanish (ADVICE r3)."""
    import pandas as pd

    from tits_spark.streaming.twa_stream import stream_twa

    src, out, ckpt = (str(tmp_path / d) for d in ("lsrc", "lout", "lckpt"))
    base = pd.Timestamp("2026-01-01 00:00:00")
    b1 = pd.DataFrame({
        "key": "k",
        "ts": [base, base + pd.Timedelta(hours=2)],
        "value": [1.0, 2.0],
    })
    spark.createDataFrame(b1, SCHEMA).write.mode("overwrite").parquet(src)
    stream_twa(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    # batch 2: one LATE event (older than the carried t0) + one fresh
    # event that finalizes more buckets so an emission happens
    b2 = pd.DataFrame({
        "key": "k",
        "ts": [base + pd.Timedelta(hours=1), base + pd.Timedelta(hours=4)],
        "value": [9.0, 3.0],
    })
    spark.createDataFrame(b2, SCHEMA).write.mode("append").parquet(src)
    stream_twa(spark, src, SCHEMA, out, ckpt, bucket_secs=3600).awaitTermination(300)
    rows = spark.read.parquet(out).orderBy("bucket_ts").collect()
    assert rows, "expected emissions"
    assert max(r["n_late_total"] for r in rows) == 1
