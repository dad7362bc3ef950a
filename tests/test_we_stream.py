"""Western Electric stream twin: planted shift fires after the
baseline freezes, stable control emits nothing; stream alert rows ≡
batch tick replay incl. restarts."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.western_electric import western_electric_ticks
from tits_spark.streaming.we_stream import stream_western_electric

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 1, 1)
B = 30


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    rng = np.random.default_rng(211)
    rows = []
    # shift: in-control for the baseline + 20, then +4 sigma level
    for i in range(120):
        mu = 50.0 if i < B + 20 else 52.0
        rows.append(
            ("shift", BASE + dt.timedelta(seconds=i),
             round(mu + float(rng.normal(0, 0.3)), 2))
        )
    # stable control
    for i in range(120):
        rows.append(
            ("flat", BASE + dt.timedelta(seconds=i),
             round(50.0 + float(rng.normal(0, 0.3)), 2))
        )
    return rows


def test_we_batch_detects_shift(spark):
    got = western_electric_ticks(
        _mk(spark, _rows()), baseline_n=B
    ).collect()
    keys = {r["key"] for r in got}
    assert "shift" in keys
    n_flat = sum(1 for r in got if r["key"] == "flat")
    n_shift = sum(1 for r in got if r["key"] == "shift")
    assert n_shift > 10 * max(n_flat, 1) or n_flat == 0


def test_we_stream_matches_batch_with_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows = _rows()
    ev = _mk(spark, rows)
    cut1 = BASE + dt.timedelta(seconds=45)
    cut2 = BASE + dt.timedelta(seconds=90)
    _mk(spark, [r for r in rows if r[1] <= cut1]).write.mode(
        "overwrite"
    ).parquet(src)
    stream_western_electric(
        spark, src, SCHEMA, out, ckpt, baseline_n=B
    ).awaitTermination(300)
    _mk(spark, [r for r in rows if cut1 < r[1] <= cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_western_electric(
        spark, src, SCHEMA, out, ckpt, baseline_n=B
    ).awaitTermination(300)
    _mk(spark, [r for r in rows if r[1] > cut2]).write.mode("append").parquet(
        src
    )
    stream_western_electric(
        spark, src, SCHEMA, out, ckpt, baseline_n=B
    ).awaitTermination(300)
    want = western_electric_ticks(ev, baseline_n=B).withColumn(
        "us", F.col("us").cast("long")
    )
    got = spark.read.parquet(out).select(*want.columns)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
