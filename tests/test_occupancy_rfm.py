"""occupancy / rfm / loghist: hand cases + invariants on real events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.loghist import loghist_quantiles
from tits_spark.operators.occupancy import _distributed_cumsum, concurrency_timeline
from tits_spark.operators.rfm import rfm_scores

UTC = dt.timezone.utc


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=sec)


# ---------------------------------------------------------------- occupancy


def test_concurrency_hand_case(spark):
    # u1 session [0s, 10s+1µs), u2 [5s, 20s+1µs), u3 [10s, 12s+1µs):
    # u3 starts exactly where nothing ends -> stacking to 3
    rows = [
        ("u1", _ts(0)), ("u1", _ts(10)),
        ("u2", _ts(5)), ("u2", _ts(20)),
        ("u3", _ts(10)), ("u3", _ts(12)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r.t_us: r.concurrency for r in concurrency_timeline(df).collect()}
    s = 1_000_000
    base = 1709251200 * s  # 2024-03-01 UTC in epoch µs
    assert out[base + 0] == 1
    assert out[base + 5 * s] == 2
    assert out[base + 10 * s] == 3          # u3 opens at 10s sharp
    assert out[base + 10 * s + 1] == 2      # u1 closes just after
    assert out[base + 20 * s + 1] == 0      # sweep returns to zero


def test_concurrency_invariants(spark, events):
    out = concurrency_timeline(events).cache()
    try:
        assert out.filter(F.col("concurrency") < 0).count() == 0
        # deltas must net to zero and the last boundary closes the sweep
        assert out.agg(F.sum("delta")).first()[0] == 0
        last = out.orderBy(F.desc("t_us")).first()
        assert last.concurrency == 0
    finally:
        out.unpersist()


def test_distributed_cumsum_matches_global_window(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 10007).alias("t"), (F.col("id") % 13 - 6).alias("v")
    ).groupBy("t").agg(F.sum("v").alias("v"))
    got = _distributed_cumsum(df, "t", "v", "cum", n_buckets=7)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


# --------------------------------------------------------------------- rfm


def test_rfm_hand_case(spark):
    # 5 users, frequencies 1..5 -> f_score = identity under exact
    # nearest-rank thresholds
    rows = []
    for i, freq in enumerate([1, 2, 3, 4, 5], start=1):
        for j in range(freq):
            rows.append((f"u{i}", _ts(i * 100 + j), 10.00))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = {r.key: r for r in rfm_scores(df).collect()}
    assert [out[f"u{i}"].f_score for i in range(1, 6)] == [1, 2, 3, 4, 5]
    # u5 has the latest event -> lowest recency -> r_score 1
    assert out["u5"].r_score == 1 and out["u1"].r_score == 5
    # monetary = freq * 1000 cents, so m_score mirrors f_score
    assert out["u3"].monetary_cents == 3000 and out["u3"].m_score == 3
    assert out["u4"].rfm == out["u4"].r_score * 100 + 44


def test_rfm_ties_share_scores(spark):
    rows = [(f"u{i}", _ts(i), 5.00) for i in range(10)]  # all freq=1
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = rfm_scores(df)
    assert out.select("f_score").distinct().count() == 1
    assert out.select("m_score").distinct().count() == 1


def test_rfm_invariants(spark, events):
    out = rfm_scores(events).cache()
    try:
        for c in ("r_score", "f_score", "m_score"):
            assert out.filter((F.col(c) < 1) | (F.col(c) > 5)).count() == 0
        # by construction count(score <= k) = cumcount(t_k) >= ceil(k*n/5)
        n = out.count()
        for k in (1, 2, 3, 4):
            got = out.filter(F.col("f_score") <= k).count()
            assert got >= (k * n + 4) // 5
        # score is monotone in the metric
        bad = (
            out.alias("a")
            .join(out.alias("b"), F.col("a.frequency") < F.col("b.frequency"))
            .filter(F.col("a.f_score") > F.col("b.f_score"))
        )
        assert bad.count() == 0
    finally:
        out.unpersist()


# ----------------------------------------------------------------- loghist


def test_loghist_hand_case(spark):
    # centi-values 1,2,3,4..7,8 -> buckets 1,2,2,3,3,3,3,4
    vals = [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08]
    rows = [("k", v) for v in vals]
    df = spark.createDataFrame(rows, "user_id string, value double")
    r = loghist_quantiles(df).first()
    assert r.n_obs == 8 and r.n_buckets == 4
    # p50: rank ceil(0.5*8)=4 -> cum: b1=1, b2=3, b3=7 -> bucket 3
    assert r.p50_bucket == 3 and r.p50_lo == 4
    # p99: rank 8 -> bucket 4 (value 8 centi)
    assert r.p99_bucket == 4 and r.p99_lo == 8


def test_loghist_envelope_on_events(spark, events):
    out = loghist_quantiles(events)
    # quantile buckets are ordered and the lower bound is a power of two
    bad = out.filter(
        (F.col("p50_bucket") > F.col("p95_bucket"))
        | (F.col("p95_bucket") > F.col("p99_bucket"))
        | (F.col("p50_lo") != F.expr("shiftleft(1L, p50_bucket - 1)"))
    )
    assert bad.count() == 0
