"""Streaming GARCH ≡ batch garch_filter(init_var), bit for bit,
including a 3-phase restart."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.garch import garch_filter
from tits_spark.streaming.garch_stream import stream_garch

SCHEMA = "key string, ts timestamp, value double"
V0 = 250000.0  # explicit calibration (cents^2)


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _stream_last(spark, out):
    w = Window.partitionBy("key").orderBy(F.desc("n_ret"))
    return (
        spark.read.parquet(out)
        .withColumn("_r", F.row_number().over(w))
        .filter("_r = 1")
        .select(
            "key",
            "n_ret",
            F.round("s", 2).alias("s_last"),
            F.round(F.col("z2") / F.col("n_ret"), 6).alias("z2_mean"),
        )
    )


def _batch(ev):
    return garch_filter(ev, init_var=V0).select(
        "key", "n_ret", "s_last", "z2_mean"
    )


def test_stream_garch_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_garch(spark, src, SCHEMA, out, ckpt, init_var=V0).awaitTermination(300)
    got = _stream_last(spark, out)
    want = _batch(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_garch_restart_bit_equal(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    ev = _ev(events).withColumn(
        "_r",
        F.row_number().over(Window.partitionBy("key").orderBy("ts", "value")),
    )
    ev.filter(F.col("_r") <= 4).drop("_r").write.mode("overwrite").parquet(src)
    stream_garch(spark, src, SCHEMA, out, ckpt, init_var=V0).awaitTermination(300)
    ev.filter((F.col("_r") > 4) & (F.col("_r") <= 33)).drop("_r").write.mode(
        "append"
    ).parquet(src)
    stream_garch(spark, src, SCHEMA, out, ckpt, init_var=V0).awaitTermination(300)
    ev.filter(F.col("_r") > 33).drop("_r").write.mode("append").parquet(src)
    stream_garch(spark, src, SCHEMA, out, ckpt, init_var=V0).awaitTermination(300)
    got = _stream_last(spark, out)
    want = _batch(_ev(events))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_emitted_s_is_pre_innovation(spark, tmp_path):
    """Row i's s must be sigma2_i (available BEFORE r_i), so the first
    emitted s is exactly init_var and the recursion matches by hand."""
    import datetime as dt

    src, out, ckpt = (str(tmp_path / d) for d in ("psrc", "pout", "pckpt"))
    base = dt.datetime(2024, 1, 1)
    cents = [1000, 1300, 900, 2000]
    rows = [
        ("k", base + dt.timedelta(minutes=i), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)
    stream_garch(spark, src, SCHEMA, out, ckpt, init_var=V0).awaitTermination(300)
    got = sorted(spark.read.parquet(out).collect(), key=lambda r: r["n_ret"])
    assert [r["n_ret"] for r in got] == [1, 2, 3]
    assert got[0]["s"] == V0
    om = V0 * 0.0625
    s2 = om + 0.0625 * 300.0**2 + 0.875 * V0
    assert got[1]["s"] == s2
    s3 = om + 0.0625 * 400.0**2 + 0.875 * s2
    assert got[2]["s"] == s3
