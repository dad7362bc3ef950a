"""Streaming risk ledger ≡ batch risk_ratios replayed on every
closed-day prefix, incl. restarts and duplicate-timestamp ties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tits_spark.operators.risk_ratios import risk_ratios
from tits_spark.streaming.risk_stream import stream_risk_ratios

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 1, 1)
RATIO_COLS = ["n_days", "sum_r", "down2", "gain", "loss", "maxdd",
              "sortino", "omega", "calmar"]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    rows = []
    vals = [100.0, 103.5, 99.25, 99.25, 104.0, 95.5, 95.5, 101.0, 97.75,
            108.0, 92.0, 92.0, 106.25, 100.5, 103.0]
    for k in ("a", "b"):
        off = 0.0 if k == "a" else 7.25
        for d, v in enumerate(vals):
            rows.append((k, BASE + dt.timedelta(days=d, hours=3), v + off))
            rows.append((k, BASE + dt.timedelta(days=d, hours=17), v + off - 0.5))
            # duplicate timestamp at the close: max-cents dedup rule
            rows.append((k, BASE + dt.timedelta(days=d, hours=17), v + off - 1.0))
    return rows


def _replay_check(spark, ev, got):
    """Every emitted ledger row must equal batch risk_ratios over the
    prefix of days <= that row's d."""
    for r in got.collect():
        prefix = ev.filter(
            F.col("ts") < dt.datetime.fromtimestamp(0, dt.UTC).replace(tzinfo=None)
            + dt.timedelta(microseconds=(r["d"] + 1) * 86_400_000_000)
        )
        want = risk_ratios(prefix, min_days=3).collect()
        w = next((x for x in want if x["key"] == r["key"]), None)
        if w is None:  # prefix shorter than min_days: skip gate rows
            assert r["n_days"] < 3
            continue
        for col in RATIO_COLS:
            assert r[col] == w[col], (r["key"], r["d"], col, r[col], w[col])


def test_stream_risk_matches_batch_prefixes(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev = _mk(spark, _rows())
    ev.write.mode("overwrite").parquet(src)
    stream_risk_ratios(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    # 15 days -> 14 closes per key
    assert got.count() == 28
    _replay_check(spark, ev, got)


def test_stream_risk_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("rsrc", "rout", "rckpt"))
    rows = _rows()
    ev = _mk(spark, rows)
    cut1 = BASE + dt.timedelta(days=5, hours=1)
    cut2 = BASE + dt.timedelta(days=10, hours=1)
    _mk(spark, [r for r in rows if r[1] <= cut1]).write.mode(
        "overwrite"
    ).parquet(src)
    stream_risk_ratios(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if cut1 < r[1] <= cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_risk_ratios(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if r[1] > cut2]).write.mode("append").parquet(
        src
    )
    stream_risk_ratios(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 28
    _replay_check(spark, ev, got)
    # the final ledger row per key equals the batch over all closed days
    last = {
        r["key"]: r
        for r in got.orderBy("key", "d")
        .groupBy("key")
        .agg(F.max_by(F.struct(*RATIO_COLS), "d").alias("s"))
        .select("key", "s.*")
        .collect()
    }
    closed = ev.filter(
        F.col("ts") < BASE + dt.timedelta(days=14)
    )
    for w in risk_ratios(closed, min_days=3).collect():
        for col in RATIO_COLS:
            assert last[w["key"]][col] == w[col], (w["key"], col)
