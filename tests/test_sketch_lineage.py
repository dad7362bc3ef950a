"""Sketch tiers under the lineage/resume discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.lineage import incremental_sketches, verify_lineage
from tits_spark.operators.quantiles import value_histogram
from tits_spark.operators.rollup_sketch import distinct_registers


def _raw(events):
    return events.select(
        F.col("user_id").alias("conv_id"), "ts", "value"
    )


def _m(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_sketches_build_resume_verify(spark, events, tmp_path):
    tiers, metrics = str(tmp_path / "tiers"), str(tmp_path / "metrics")
    raw = _raw(events)
    p1 = incremental_sketches(spark, raw, tiers, metrics)
    assert p1["hll_1m"] > 0 and p1["hist_1m"] > 0
    # second run: everything committed -> nothing reprocessed
    p2 = incremental_sketches(spark, raw, tiers, metrics)
    assert p2 == {"hll_1m": 0, "hist_1m": 0}
    # stored tiers equal direct batch builds
    regs = spark.read.parquet(f"{tiers}/tier=hll_1m")
    want_regs = distinct_registers(
        raw.select("ts", F.col("conv_id").cast("string").alias("_it")),
        "ts", "_it", "1m",
    )
    assert _m(regs, ["bucket_ts", "reg", "rho"]) == _m(
        want_regs, ["bucket_ts", "reg", "rho"]
    )
    hist = spark.read.parquet(f"{tiers}/tier=hist_1m")
    want_hist = value_histogram(
        raw.select(F.date_trunc("minute", "ts").alias("bucket_ts"), "value"),
        ["bucket_ts"],
    )
    assert _m(hist, ["bucket_ts", "q", "cnt"]) == _m(
        want_hist, ["bucket_ts", "q", "cnt"]
    )
    # lineage checksums attest what's on disk, sketch stages included
    v = verify_lineage(spark, tiers, metrics)
    sk = v.filter(F.col("stage").isin("hll_1m", "hist_1m"))
    assert sk.count() > 0
    assert sk.filter(~F.col("match")).count() == 0


def test_sketches_incremental_days(spark, events, tmp_path):
    tiers, metrics = str(tmp_path / "tiers"), str(tmp_path / "metrics")
    raw = _raw(events)
    early = raw.where(F.dayofmonth("ts") <= 10)
    n_days_early = early.select(F.to_date("ts")).distinct().count()
    p1 = incremental_sketches(spark, early, tiers, metrics)
    assert p1["hll_1m"] == n_days_early
    # full input: only the new days are processed, result == one-shot
    n_days_all = raw.select(F.to_date("ts")).distinct().count()
    p2 = incremental_sketches(spark, raw, tiers, metrics)
    assert p2["hll_1m"] == n_days_all - n_days_early
    got = spark.read.parquet(f"{tiers}/tier=hll_1m")
    want = distinct_registers(
        raw.select("ts", F.col("conv_id").cast("string").alias("_it")),
        "ts", "_it", "1m",
    )
    assert _m(got, ["bucket_ts", "reg", "rho"]) == _m(
        want, ["bucket_ts", "reg", "rho"]
    )
