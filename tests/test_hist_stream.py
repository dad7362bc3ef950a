"""Streaming histogram deltas ≡ batch, replay-safe, compactable."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.quantiles import (
    quantiles_from_hist,
    value_histogram,
)
from tits_spark.streaming.hist_stream import (
    compact,
    read_histogram,
    stream_histogram,
    write_hist_delta,
)

SCHEMA = "ts timestamp, value double"


def _src(events):
    return events.select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def _h(df):
    return {(r["bucket_ts"], r["q"]): r["cnt"] for r in df.collect()}


def _batch_hist(ev):
    return value_histogram(
        ev.select(F.date_trunc("minute", "ts").alias("bucket_ts"), "value"),
        ["bucket_ts"],
    )


def test_incremental_equals_batch_and_compaction(spark, events, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    ev = _src(events)
    ev.where(F.dayofmonth("ts") <= 15).write.mode("overwrite").parquet(src)
    stream_histogram(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    ev.where(F.dayofmonth("ts") > 15).write.mode("append").parquet(src)
    stream_histogram(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    want = _batch_hist(ev)
    assert _h(read_histogram(spark, tbl)) == _h(want)
    # quantiles read off the maintained table == batch quantiles
    qs = quantiles_from_hist(read_histogram(spark, tbl), ["bucket_ts"])
    qb = quantiles_from_hist(want, ["bucket_ts"])
    assert sorted(map(tuple, qs.collect())) == sorted(map(tuple, qb.collect()))
    # compaction folds deltas without changing the merged view
    compact(spark, tbl)
    ids = spark.read.parquet(tbl).select("batch_id").distinct().collect()
    assert [r["batch_id"] for r in ids] == [-1]
    assert _h(read_histogram(spark, tbl)) == _h(want)


def test_replay_overwrites_not_doubles(spark, events, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = _src(events).limit(400)
    write_hist_delta(ev, tbl, 7, "minute", "ts", "value", 100)
    once = _h(read_histogram(spark, tbl))
    # at-least-once replay: the SAME batch_id arrives again
    write_hist_delta(ev, tbl, 7, "minute", "ts", "value", 100)
    assert _h(read_histogram(spark, tbl)) == once
