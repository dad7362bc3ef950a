"""Weekend-rate prefix ledger: batch closed-day semantics, stream ≡
batch bit-for-bit incl. restarts (raw-double readouts)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.ratecomp import weekend_rate_prefix
from tits_spark.streaming.rate_stream import stream_weekend_rate

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 3, 4)  # a Monday


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    rng = np.random.default_rng(271)
    rows = []
    for k, surge in (("surge", True), ("flat", False)):
        for d in range(40):
            dow = (dt.date(2024, 3, 4) + dt.timedelta(days=d)).weekday()
            base_n = 3
            n = (
                base_n + (12 if surge and dow >= 5 else 0)
                + int(rng.integers(0, 3))
            )
            for j in range(n):
                rows.append(
                    (k, BASE + dt.timedelta(days=d, minutes=3 * j),
                     float(j))
                )
    return rows


def test_prefix_batch_semantics(spark):
    got = (
        weekend_rate_prefix(_mk(spark, _rows()))
        .orderBy("key", "day")
        .collect()
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    # one row per closed observed day past the span gate
    assert len(by_key["surge"]) == 40 - 14
    # counts are cumulative and z grows as evidence accumulates
    s = by_key["surge"]
    assert s[-1]["c_weekend"] > s[0]["c_weekend"]
    assert s[-1]["rate_z"] > 5
    assert abs(by_key["flat"][-1]["rate_z"]) < 2.5


def test_rate_stream_matches_batch_with_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows = _rows()
    ev = _mk(spark, rows)
    cut1 = BASE + dt.timedelta(days=15)
    cut2 = BASE + dt.timedelta(days=27)
    _mk(spark, [r for r in rows if r[1] <= cut1]).write.mode(
        "overwrite"
    ).parquet(src)
    stream_weekend_rate(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if cut1 < r[1] <= cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_weekend_rate(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if r[1] > cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_weekend_rate(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    want = weekend_rate_prefix(ev)
    got = spark.read.parquet(out).select(*want.columns)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
