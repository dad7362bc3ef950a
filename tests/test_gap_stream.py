"""Streaming gap alerts ≡ batch gap_intervals, incl. incremental runs."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from tits_spark.operators.windows import gap_intervals
from tits_spark.streaming.gap_stream import stream_gaps

SCHEMA = "key string, ts timestamp, value double"
THRESH = 86400.0


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _norm(df):
    return df.select("key", "gap_start", "gap_end", F.round("gap_sec", 6).alias("g"))


def test_stream_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_gaps(spark, src, SCHEMA, out, ckpt, THRESH).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(gap_intervals(ev, ["key"], "ts", THRESH))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_incremental_restart_matches(spark, events, tmp_path):
    # feed the first half, run; append the second half, run again with
    # the same checkpoint: union of outputs == batch over everything
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events).withColumn(
        "_r", F.row_number().over(Window.partitionBy("key").orderBy("ts"))
    )
    mid = 30
    ev.filter(F.col("_r") <= mid).drop("_r").write.mode("overwrite").parquet(src)
    stream_gaps(spark, src, SCHEMA, out, ckpt, THRESH).awaitTermination(300)
    ev.filter(F.col("_r") > mid).drop("_r").write.mode("append").parquet(src)
    stream_gaps(spark, src, SCHEMA, out, ckpt, THRESH).awaitTermination(300)
    got = _norm(spark.read.parquet(out))
    want = _norm(gap_intervals(ev.drop("_r"), ["key"], "ts", THRESH))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stale_timeout_unit():
    # drive the timeout branch directly: a timed-out state emits the
    # open-ended alert and clears itself
    import pandas as pd

    from tits_spark.streaming.gap_stream import make_gap_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (1_700_000_000_000_000,)
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    fn = make_gap_fn(60.0, stale_timeout_sec=120.0)
    out = list(fn(("k1",), iter([]), st))
    assert st.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["key"] == "k1"
    assert pd.isna(row["gap_end"]) and pd.isna(row["gap_sec"])
    assert row["gap_start"] == pd.Timestamp(1_700_000_000_000_000, unit="us")
