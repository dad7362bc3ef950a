"""Page-Hinkley batch + stream: planted drift fires, stationary
doesn't; stream alarm rows ≡ batch replay incl. restarts."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.page_hinkley import page_hinkley
from tits_spark.streaming.ph_stream import stream_page_hinkley

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    rng = np.random.default_rng(157)
    rows = []
    # drift: mean jumps 50 -> 70 halfway
    for i in range(200):
        mu = 50.0 if i < 100 else 70.0
        rows.append(
            ("drift", BASE + dt.timedelta(seconds=i),
             round(mu + float(rng.normal(0, 1)), 2))
        )
    # stationary control
    for i in range(200):
        rows.append(
            ("flat", BASE + dt.timedelta(seconds=i),
             round(50.0 + float(rng.normal(0, 1)), 2))
        )
    return rows


def test_ph_batch_detects_drift(spark):
    got = page_hinkley(_mk(spark, _rows()), delta_cents=50).collect()
    keys = {r["key"] for r in got}
    assert "drift" in keys and "flat" not in keys
    first = min(r["t"] for r in got if r["key"] == "drift")
    assert 100 < first < 130  # fires shortly after the level shift
    for r in got:
        assert r["excess_u"] == r["ph_u"] - r["min_u"] > 500_000_000


def test_ph_stream_matches_batch_with_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows = _rows()
    ev = _mk(spark, rows)
    cut1 = BASE + dt.timedelta(seconds=80)
    cut2 = BASE + dt.timedelta(seconds=140)
    _mk(spark, [r for r in rows if r[1] <= cut1]).write.mode(
        "overwrite"
    ).parquet(src)
    stream_page_hinkley(spark, src, SCHEMA, out, ckpt, delta_cents=50).awaitTermination(300)
    _mk(spark, [r for r in rows if cut1 < r[1] <= cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_page_hinkley(spark, src, SCHEMA, out, ckpt, delta_cents=50).awaitTermination(300)
    _mk(spark, [r for r in rows if r[1] > cut2]).write.mode("append").parquet(
        src
    )
    stream_page_hinkley(spark, src, SCHEMA, out, ckpt, delta_cents=50).awaitTermination(300)
    want = page_hinkley(ev, delta_cents=50).withColumn("us", F.col("us").cast("long"))
    got = spark.read.parquet(out).select(*want.columns)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
