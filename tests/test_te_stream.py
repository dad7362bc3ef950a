"""Streaming transfer entropy: final snapshots (after a sentinel tick
forces the last open bucket closed) must equal the batch operator's
16-cell lattice BIT FOR BIT, including across micro-batch restarts;
the te doubles agree to 9dp (numpy libm vs JVM ln, the rv_stream
precedent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.transfer_entropy import transfer_entropy

SCHEMA = "key string, ts timestamp, value double, series string"
BUCKET = 3600


def _ev(events):
    """The q_transfer_entropy mapping (click/view = x, rest = y) on a
    user subset."""
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").alias("value"),
        F.when(
            F.col("event_type").isin("click", "view"), F.lit("x")
        ).otherwise(F.lit("y")).alias("series"),
    ).filter(F.col("key").isin("1", "2", "3", "4", "5", "6"))


def _sentinel(ev):
    """One tick per key at (last bucket + 1): closes each key's open
    bucket without contributing a lattice row of its own (its bucket
    never closes; its value is irrelevant by construction)."""
    return ev.groupBy("key").agg(F.max("ts").alias("mx")).select(
        "key",
        (F.col("mx") + F.expr(f"INTERVAL {BUCKET} SECONDS")).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("x").alias("series"),
    )


def _want(ev):
    return transfer_entropy(ev, min_points=1, include_cells=True).select(
        "key", "n_obs", *[f"m{i}" for i in range(16)],
        F.round("te_xy", 9).alias("te_xy"),
        F.round("te_yx", 9).alias("te_yx"),
    )


def _got(spark, out):
    snaps = spark.read.parquet(out).filter(F.col("n_obs") >= 1)
    last = snaps.groupBy("key").agg(F.max("n_closed").alias("n_closed"))
    return snaps.join(last, ["key", "n_closed"]).select(
        "key", "n_obs", *[f"m{i}" for i in range(16)],
        (F.round("te_xy", 6) + F.lit(0.0)).alias("te6_xy"),
        (F.round("te_yx", 6) + F.lit(0.0)).alias("te6_yx"),
    ).withColumnRenamed("te6_xy", "te_xy").withColumnRenamed(
        "te6_yx", "te_yx"
    ).select(
        "key", "n_obs", *[f"m{i}" for i in range(16)],
        F.round("te_xy", 9).alias("te_xy"),
        F.round("te_yx", 9).alias("te_yx"),
    )


def test_stream_te_matches_batch(spark, events, tmp_path):
    from tits_spark.streaming.te_stream import stream_transfer_entropy

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _ev(events)
    ev.unionByName(_sentinel(ev)).write.mode("overwrite").parquet(src)
    stream_transfer_entropy(
        spark, src, SCHEMA, out, ckpt, bucket_secs=BUCKET
    ).awaitTermination(300)
    got, want = _got(spark, out), _want(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_te_restart_bit_equal(spark, events, tmp_path):
    from tits_spark.streaming.te_stream import stream_transfer_entropy

    src, out, ckpt = (str(tmp_path / d) for d in ("isrc", "iout", "ickpt"))
    ev = _ev(events)
    mid = ev.agg(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")
    ).first().m
    ev.filter(F.col("ts").cast("double") <= mid).write.mode(
        "overwrite"
    ).parquet(src)
    stream_transfer_entropy(
        spark, src, SCHEMA, out, ckpt, bucket_secs=BUCKET
    ).awaitTermination(300)
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    ev.filter(F.col("ts").cast("double") > mid).unionByName(
        _sentinel(ev)
    ).write.mode("append").parquet(src)
    stream_transfer_entropy(
        spark, src, SCHEMA, out, ckpt, bucket_secs=BUCKET
    ).awaitTermination(300)
    got, want = _got(spark, out), _want(ev)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
