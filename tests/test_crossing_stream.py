"""Threshold crossings: batch vs naive pandas, stream vs batch
(including incremental restarts)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.windows import threshold_crossings

SCHEMA = "key string, ts timestamp, value double"
LEVEL = 100.0


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4"))


def test_crossings_match_pandas(spark, events):
    ev = _ev(events)
    got = (
        threshold_crossings(ev, ["key"], "ts", "value", LEVEL)
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    pdf = ev.toPandas().sort_values(["key", "ts"])
    pdf["prev"] = pdf.groupby("key")["value"].shift(1)
    up = (pdf["prev"] < LEVEL) & (pdf["value"] >= LEVEL)
    down = (pdf["prev"] >= LEVEL) & (pdf["value"] < LEVEL)
    want = pdf[up | down].reset_index(drop=True)
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["value"], want["value"])
    np.testing.assert_array_equal(got["prev_value"], want["prev"])
    np.testing.assert_array_equal(
        got["direction"], np.where(want["value"] >= LEVEL, "up", "down")
    )


def test_on_level_sample_counts_as_above(spark):
    rows = [
        ("a", "2026-01-01 00:00:00", 50.0),
        ("a", "2026-01-01 00:01:00", 100.0),  # up (prev < 100 <= 100)
        ("a", "2026-01-01 00:02:00", 100.0),  # no crossing (still at/above)
        ("a", "2026-01-01 00:03:00", 99.0),   # down
    ]
    df = spark.createDataFrame(rows, "key string, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = threshold_crossings(df, ["key"], "ts", "value", 100.0).toPandas()
    assert list(out.sort_values("ts")["direction"]) == ["up", "down"]


def _stream_rows(spark, out):
    return spark.read.parquet(out).select(
        "key", "ts", "value", "prev_value", "direction"
    )


def test_stream_crossings_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.crossing_stream import stream_crossings

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_crossings(spark, src, SCHEMA, out, ckpt, level=LEVEL).awaitTermination(300)
    got = _stream_rows(spark, out)
    want = threshold_crossings(ev, ["key"], "ts", "value", LEVEL)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_crossings_across_restarts(spark, events, tmp_path):
    from tits_spark.streaming.crossing_stream import stream_crossings

    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    mid = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode("overwrite").parquet(src)
    stream_crossings(spark, src, SCHEMA, out, ckpt, level=LEVEL).awaitTermination(300)
    ev.filter(F.col("ts").cast("double") > mid).write.mode("append").parquet(src)
    stream_crossings(spark, src, SCHEMA, out, ckpt, level=LEVEL).awaitTermination(300)
    got = _stream_rows(spark, out)
    want = threshold_crossings(ev, ["key"], "ts", "value", LEVEL)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
