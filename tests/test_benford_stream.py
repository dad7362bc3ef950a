"""Streaming Benford digit deltas ≡ batch benford_audit, replay-safe,
compactable — the per-key digit-lattice continuous aggregate
(twin #31)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.benford import benford_audit
from tits_spark.streaming.benford_stream import (
    compact,
    read_report,
    stream_benford,
    write_digit_delta,
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
    stream_benford(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    ev.where(F.dayofmonth("ts") > 15).write.mode("append").parquet(src)
    stream_benford(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    want = benford_audit(ev)
    # bit-equal: the reader goes through the batch finalize stage
    assert _rows(read_report(spark, tbl)) == _rows(want)
    # compaction folds deltas without changing the merged view
    compact(spark, tbl)
    ids = spark.read.parquet(tbl).select("batch_id").distinct().collect()
    assert [r["batch_id"] for r in ids] == [-1]
    assert _rows(read_report(spark, tbl)) == _rows(want)


def test_replay_overwrites_not_doubles(spark, events, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = _src(events).limit(400)
    write_digit_delta(ev, tbl, 7, "key", "value")
    once = _rows(read_report(spark, tbl, min_n=1))
    # at-least-once replay: the SAME batch_id arrives again — the
    # dynamic partition overwrite must NOT inflate any digit count
    write_digit_delta(ev, tbl, 7, "key", "value")
    assert _rows(read_report(spark, tbl, min_n=1)) == once
