"""Streaming contingency cell deltas ≡ batch chi2_independence,
replay-safe, compactable — the cross-category continuous aggregate
(twin #28)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.mutual_info import chi2_independence
from tits_spark.streaming.contingency_stream import (
    compact,
    read_chi2,
    stream_contingency,
    write_cell_delta,
)

SCHEMA = "key string, ts timestamp, event_type string"


def _src(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_batch_and_compaction(spark, events, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    ev = _src(events)
    ev.where(F.dayofmonth("ts") <= 15).write.mode("overwrite").parquet(src)
    stream_contingency(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    ev.where(F.dayofmonth("ts") > 15).write.mode("append").parquet(src)
    stream_contingency(spark, src, SCHEMA, tbl, ckpt).awaitTermination(300)
    want = chi2_independence(ev)
    # bit-equal: the reader goes through the batch finalize stage
    assert _rows(read_chi2(spark, tbl)) == _rows(want)
    # compaction folds deltas without changing the merged view
    compact(spark, tbl)
    ids = spark.read.parquet(tbl).select("batch_id").distinct().collect()
    assert [r["batch_id"] for r in ids] == [-1]
    assert _rows(read_chi2(spark, tbl)) == _rows(want)


def test_replay_overwrites_not_doubles(spark, events, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = _src(events).limit(400)
    write_cell_delta(ev, tbl, 7, "key", "ts", "event_type")
    once = _rows(read_chi2(spark, tbl))
    # at-least-once replay: the SAME batch_id arrives again — the
    # dynamic partition overwrite must NOT shift any marginal
    write_cell_delta(ev, tbl, 7, "key", "ts", "event_type")
    assert _rows(read_chi2(spark, tbl)) == once
