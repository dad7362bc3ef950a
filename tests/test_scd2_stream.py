"""Streaming SCD2 ≡ batch closed intervals, row for row, incl. a
3-phase restart that splits runs across checkpointed executions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.scd2 import scd2_intervals
from tits_spark.streaming.scd2_stream import stream_scd2

SCHEMA = "key string, ts timestamp, attr string"


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_type").alias("attr"),
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _closed_batch(ev):
    return (
        scd2_intervals(ev, "key", "ts", "attr")
        .filter(~F.col("is_current"))
        .select("key", "version", "attr", "valid_from", "valid_to", "n_events")
    )


def test_stream_scd2_matches_batch_closed_rows(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_scd2(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    want = _closed_batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_scd2_restart_splits_runs(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    ev = _ev(events).withColumn(
        "_r", F.row_number().over(Window.partitionBy("key").orderBy("ts", "attr"))
    )
    ev.filter(F.col("_r") <= 2).drop("_r").write.mode("overwrite").parquet(src)
    stream_scd2(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("_r") > 2) & (F.col("_r") <= 30)).drop("_r").write.mode(
        "append"
    ).parquet(src)
    stream_scd2(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("_r") > 30).drop("_r").write.mode("append").parquet(src)
    stream_scd2(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    want = _closed_batch(_ev(events))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_scd2_null_attr_matches_batch(spark, tmp_path):
    # null-safe change semantics must agree batch vs stream: a NULL
    # attr opens its own run (also as a key's FIRST run) and
    # consecutive NULLs collapse
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("u", base + dt.timedelta(hours=h), a)
        for h, a in enumerate(["a", None, None, "a", "b"])
    ] + [("w", base + dt.timedelta(hours=h), a)
         for h, a in enumerate([None, "b", None])]
    ev = spark.createDataFrame(rows, SCHEMA)
    src, out, ckpt = (str(tmp_path / d) for d in ("nsrc", "nout", "nckpt"))
    ev.write.mode("overwrite").parquet(src)
    stream_scd2(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    want = _closed_batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
