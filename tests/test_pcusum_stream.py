"""Poisson CUSUM: integer brute replay of the batch ledger, planted
surge alarm vs stationary silence, stream ≡ batch bit-for-bit incl.
restarts and gap days."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.changepoint import poisson_cusum_daily
from tits_spark.streaming.pcusum_stream import stream_poisson_cusum

SCHEMA = "key string, ts timestamp, value double"
BASE = dt.datetime(2024, 3, 4)
B, H = 14, 20


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    rng = np.random.default_rng(307)
    rows = []
    for k in ("surge", "flat"):
        for d in range(45):
            if k == "surge" and 25 <= d < 32:
                n = 18
            elif d % 6 == 5:
                n = 0  # planted silent days
            else:
                n = 4 + int(rng.integers(0, 3))
            if d in (0, 44):
                n = max(n, 1)  # anchor the span
            for j in range(n):
                rows.append(
                    (k, BASE + dt.timedelta(days=d, minutes=2 * j), float(j))
                )
    return rows


def _brute(day_counts):
    span = len(day_counts)
    kk = sum(day_counts[:B])
    s = 0
    out = []
    for i in range(B, span - 1):
        s = max(0, s + B * day_counts[i] - kk)
        out.append((i, day_counts[i], s, s > B * H))
    return out


def test_pcusum_batch_brute_and_plant(spark):
    rows = _rows()
    # reconstruct day counts per key from rows
    from collections import Counter

    per = {"surge": Counter(), "flat": Counter()}
    for k, ts, _v in rows:
        per[k][(ts - BASE).days] += 1
    got = (
        poisson_cusum_daily(_mk(spark, rows))
        .orderBy("key", "day")
        .collect()
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    base_day = int(
        (BASE - dt.datetime(1970, 1, 1)).total_seconds() // 86400
    )
    for k in ("surge", "flat"):
        counts = [per[k].get(d, 0) for d in range(45)]
        want = _brute(counts)
        have = by_key[k]
        assert len(have) == len(want)
        for r, (i, y, s, al) in zip(have, want):
            assert r["day"] == base_day + i
            assert (r["y"], r["s_scaled"], r["alarm"]) == (y, s, al)
    assert any(r["alarm"] for r in by_key["surge"])
    assert not any(r["alarm"] for r in by_key["flat"])


def test_pcusum_stream_matches_batch_with_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    rows = _rows()
    ev = _mk(spark, rows)
    cut1 = BASE + dt.timedelta(days=18)
    cut2 = BASE + dt.timedelta(days=30)
    _mk(spark, [r for r in rows if r[1] <= cut1]).write.mode(
        "overwrite"
    ).parquet(src)
    stream_poisson_cusum(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if cut1 < r[1] <= cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_poisson_cusum(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    _mk(spark, [r for r in rows if r[1] > cut2]).write.mode(
        "append"
    ).parquet(src)
    stream_poisson_cusum(spark, src, SCHEMA, out, ckpt).awaitTermination(300)
    want = poisson_cusum_daily(ev)
    got = spark.read.parquet(out).select(*want.columns)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
