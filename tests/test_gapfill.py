"""Gap-fill fixtures: hand-built series with leading nulls, interior
gaps, single-point buckets — expected LOCF/interp values written
explicitly (FIXTURES.md §5)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.gapfill import bucket_spine, gapfill_interp, gapfill_locf

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _mk_tier(spark, rows):
    # rows: (key, minute_offset, v_last)
    data = [(k, T0 + dt.timedelta(minutes=m), float(v)) for k, m, v in rows]
    return spark.createDataFrame(data, "key string, bucket_ts timestamp, v_last double")


@pytest.fixture(scope="module")
def tier(spark):
    # key "a": obs at minutes 0, 3, 4, 7 -> gaps at 1,2,5,6
    # key "b": single point
    return _mk_tier(
        spark,
        [("a", 0, 10.0), ("a", 3, 40.0), ("a", 4, 20.0), ("a", 7, 80.0), ("b", 5, 1.0)],
    )


def _as_map(df):
    return {(r["key"], r["bucket_ts"].minute): (r[df.columns[2]], r["filled"]) for r in df.collect()}


def test_spine_dense(tier):
    sp = bucket_spine(tier, "1m").collect()
    a = sorted(r["bucket_ts"].minute for r in sp if r["key"] == "a")
    assert a == [0, 1, 2, 3, 4, 5, 6, 7]
    b = [r["bucket_ts"].minute for r in sp if r["key"] == "b"]
    assert b == [5]


def test_locf(tier):
    got = _as_map(gapfill_locf(tier, "1m"))
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", 1)] == (10.0, True)
    assert got[("a", 2)] == (10.0, True)
    assert got[("a", 3)] == (40.0, False)
    assert got[("a", 5)] == (20.0, True)
    assert got[("a", 6)] == (20.0, True)
    assert got[("a", 7)] == (80.0, False)
    assert got[("b", 5)] == (1.0, False)


def test_interp(tier):
    got = _as_map(gapfill_interp(tier, "1m"))
    assert got[("a", 1)][0] == pytest.approx(20.0)  # 10 + (40-10)*1/3
    assert got[("a", 2)][0] == pytest.approx(30.0)
    assert got[("a", 5)][0] == pytest.approx(40.0)  # 20 + (80-20)*1/3
    assert got[("a", 6)][0] == pytest.approx(60.0)
    assert got[("a", 0)][0] == 10.0 and got[("a", 0)][1] is False
    assert got[("b", 5)][0] == 1.0


def test_interp_edges(spark):
    # leading gap -> NOCB; trailing gap -> LOCF
    tier = _mk_tier(spark, [("c", 2, 5.0), ("c", 4, 9.0)])
    spine = _mk_tier(spark, [("c", m, 0) for m in range(6)]).drop("v_last")
    joined = spine.join(tier, ["key", "bucket_ts"], "left")
    # emulate full-range spine by unioning edge buckets into the tier frame
    full = gapfill_interp(
        tier.unionByName(
            spark.createDataFrame(
                [("c", T0, None), ("c", T0 + dt.timedelta(minutes=5), None)],
                "key string, bucket_ts timestamp, v_last double",
            )
        ),
        "1m",
    )
    got = _as_map(full)
    assert got[("c", 0)][0] == 5.0  # NOCB before first obs
    assert got[("c", 1)][0] == 5.0
    assert got[("c", 3)][0] == pytest.approx(7.0)
    assert got[("c", 5)][0] == 9.0  # LOCF after last obs


def test_locf_on_rollup(transcripts):
    from tits_spark.operators.rollup import rollup_from_raw

    raw = transcripts.select(
        "conv_id", "ts", F.length("text").cast("double").alias("value")
    )
    t1m = rollup_from_raw(raw, tier="1m")
    filled = gapfill_locf(t1m, "1m")
    # no NULLs after the first observed bucket per key
    w_nulls = filled.filter(F.col("v_last").isNull()).count()
    assert w_nulls == 0  # spine starts at each key's min bucket -> no leading nulls
    assert filled.count() >= t1m.count()


def test_bucket_spine_rejects_non_day_dividing_tier():
    """A sub-day tier width that does not divide 86400 would silently
    misalign the two-level day/bucket spine; it must raise instead."""
    import pytest

    from tits_spark.operators import gapfill

    saved = dict(gapfill.TIERS)
    try:
        gapfill.TIERS["7m"] = ("minute", 420)  # 86400 % 420 != 0
        with pytest.raises(ValueError, match="must divide 86400"):
            gapfill.bucket_spine(None, "7m")
    finally:
        gapfill.TIERS.clear()
        gapfill.TIERS.update(saved)
