"""Sketch-bearing rollup: per-bucket HLL registers cascade exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.rollup_sketch import (
    distinct_by_bucket,
    distinct_registers,
    registers_cascade,
)


def _pdf(df):
    return {
        (r["bucket_ts"], r["reg"]): r["rho"]
        for r in df.collect()
    }


def test_cascade_equals_direct(events):
    src = events.select("ts", F.col("user_id").cast("string").alias("item"))
    r1m = distinct_registers(src, "ts", "item", "1m")
    # 1m -> 1h cascade vs direct-from-raw 1h: identical register tables
    assert _pdf(registers_cascade(r1m, "1h")) == _pdf(
        distinct_registers(src, "ts", "item", "1h")
    )
    # and up again: (raw->1m->1h)->1d == raw->1d
    assert _pdf(registers_cascade(registers_cascade(r1m, "1h"), "1d")) == _pdf(
        distinct_registers(src, "ts", "item", "1d")
    )


def test_estimate_tracks_exact(events):
    src = events.select("ts", F.col("event_id").cast("string").alias("item"))
    regs = registers_cascade(distinct_registers(src, "ts", "item", "1m"), "1d")
    est = {r["bucket_ts"]: r["hll_est"] for r in distinct_by_bucket(regs).collect()}
    exact = {
        r["b"]: r["n"]
        for r in src.groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.countDistinct("item").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    # p=8 HLL standard error ~6.5% (linear counting is tighter still at
    # the low end); allow ~3 sigma wherever the count is non-trivial
    checked = 0
    for b, n in exact.items():
        if n >= 20:
            assert abs(est[b] - n) / n < 0.25
            checked += 1
    assert checked > 0
