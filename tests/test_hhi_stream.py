"""Streaming HHI share deltas ≡ batch hhi_per_bucket, replay-safe,
compactable — the cross-key continuous aggregate (twin #25)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.concentration import hhi_per_bucket
from tits_spark.streaming.hhi_stream import (
    compact,
    read_hhi,
    stream_hhi,
    write_share_delta,
)

SCHEMA = "key string, ts timestamp, value double"


def _src(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_batch_and_compaction(spark, events, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    ev = _src(events)
    ev.where(F.dayofmonth("ts") <= 15).write.mode("overwrite").parquet(src)
    stream_hhi(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    ev.where(F.dayofmonth("ts") > 15).write.mode("append").parquet(src)
    stream_hhi(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    want = hhi_per_bucket(ev)
    # bit-equal: the reader goes through the batch finalize stage
    assert _rows(read_hhi(spark, tbl)) == _rows(want)
    # compaction folds deltas without changing the merged view
    compact(spark, tbl)
    ids = spark.read.parquet(tbl).select("batch_id").distinct().collect()
    assert [r["batch_id"] for r in ids] == [-1]
    assert _rows(read_hhi(spark, tbl)) == _rows(want)


def test_replay_overwrites_not_doubles(spark, events, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = _src(events).limit(400)
    write_share_delta(ev, tbl, 7, "key", "ts", "value", 3_600_000_000)
    once = _rows(read_hhi(spark, tbl))
    # at-least-once replay: the SAME batch_id arrives again — the
    # dynamic partition overwrite must NOT tilt any key's share
    write_share_delta(ev, tbl, 7, "key", "ts", "value", 3_600_000_000)
    assert _rows(read_hhi(spark, tbl)) == once
