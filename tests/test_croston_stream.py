"""Streaming Croston ≡ batch croston_sba on every closed prefix, bit
for bit, including a 3-phase restart that splits keys' demand buckets
across checkpointed runs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.croston import croston_sba
from tits_spark.streaming.croston_stream import stream_croston

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 1, 1)


def _ev(events):
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).filter(F.col("key").isin("1", "2", "3", "4", "5"))


def _last_per_key(df):
    w = Window.partitionBy("key").orderBy(F.desc("b"))
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter("_r = 1")
        .select(
            "key",
            "n_dem",
            F.round("z", 6).alias("z6"),
            F.round("p", 6).alias("p6"),
        )
    )


def _batch_closed(ev):
    """Batch state over the stream's CLOSED buckets: drop each key's
    final (still-open) demand bucket before running the batch op."""
    from tits_spark.functions.exprs import epoch_us, floordiv

    b = floordiv(epoch_us("ts"), 3600 * 1_000_000)
    dem = ev.filter(F.round(F.col("value") * 100) > 0).withColumn("b", b)
    last_b = dem.groupBy("key").agg(F.max("b").alias("_mb"))
    closed = ev.withColumn("b", b).join(last_b, "key").filter(
        F.col("b") < F.col("_mb")
    )
    raw = croston_sba(closed.select("key", "ts", "value"), min_demands=1)
    return raw.select(
        "key",
        "n_dem",
        F.col("z_hat").alias("z6"),
        F.col("p_hat").alias("p6"),
    )


def test_stream_croston_matches_batch(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.write.mode("overwrite").parquet(src)
    stream_croston(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _last_per_key(spark.read.parquet(out))
    want = _batch_closed(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_croston_restart_bit_equal(spark, events, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    ev = _ev(events).withColumn(
        "_r",
        F.row_number().over(Window.partitionBy("key").orderBy("ts", "value")),
    )
    ev.filter(F.col("_r") <= 5).drop("_r").write.mode("overwrite").parquet(src)
    stream_croston(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter((F.col("_r") > 5) & (F.col("_r") <= 30)).drop("_r").write.mode(
        "append"
    ).parquet(src)
    stream_croston(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    ev.filter(F.col("_r") > 30).drop("_r").write.mode("append").parquet(src)
    stream_croston(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = _last_per_key(spark.read.parquet(out))
    want = _batch_closed(_ev(events))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_every_closed_prefix_matches(spark, tmp_path):
    """Each emitted row's (n_dem, z, p) equals the batch op run on the
    demand prefix ending at that bucket — the full recursion path."""
    src, out, ckpt = (str(tmp_path / d) for d in ("psrc", "pout", "pckpt"))
    hours = [0, 3, 4, 9, 15, 16, 30, 31, 40]
    sizes = [500, 100, 900, 40, 1200, 7, 333, 21, 60]
    rows = [
        ("k", BASE + dt.timedelta(hours=h), float(c) / 100.0)
        for h, c in zip(hours, sizes)
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    ev.write.mode("overwrite").parquet(src)
    stream_croston(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    emitted = {
        r["b"]: r for r in spark.read.parquet(out).collect()
    }
    # stream closes all buckets except the last (40)
    assert sorted(emitted) == [h + 473352 for h in hours[:-1]]
    first = emitted[473352]
    assert first["n_dem"] == 1 and first["z"] == 500.0 and first["p"] == 0.0
    for i in range(2, len(hours)):
        prefix = [
            ("k", BASE + dt.timedelta(hours=h), float(c) / 100.0)
            for h, c in zip(hours[:i], sizes[:i])
        ]
        want = croston_sba(
            spark.createDataFrame(prefix, SCHEMA), min_demands=1
        ).collect()[0]
        got = emitted[hours[i - 1] + 473352]
        assert got["n_dem"] == want["n_dem"] == i
        assert abs(got["z"] - want["z_hat"]) < 5e-7  # z_hat is round6
        assert abs(got["p"] - want["p_hat"]) < 5e-7
