"""pagerank / theil_sen: hand cases + invariants on real events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.pagerank import SCALE, coactivity_edges, pagerank
from tits_spark.operators.theilsen import theil_sen

UTC = dt.timezone.utc


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=sec)


# ---------------------------------------------------------------- pagerank


def _edges(spark, pairs):
    half = spark.createDataFrame(pairs, "src string, dst string")
    return half.unionAll(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_star_graph(spark):
    # star: hub h connected to a,b,c — hub collects 85% of each leaf's
    # whole rank, leaves each get a third of the hub's
    e = _edges(spark, [("h", "a"), ("h", "b"), ("h", "c")])
    out = {r.key: r for r in pagerank(e, n_iter=1).collect()}
    base = round(0.15 * SCALE)
    assert out["h"].outdeg == 3
    assert out["h"].rank == base + 3 * ((85 * SCALE) // 100)
    assert out["a"].rank == base + (85 * SCALE) // (100 * 3)
    assert out["a"].rank == out["b"].rank == out["c"].rank


def test_pagerank_symmetric_pair_fixed_point(spark):
    # two nodes, one edge: each sends its whole damped rank to the
    # other; iteration converges to base / (1 - 0.85) (integer-truncated)
    e = _edges(spark, [("x", "y")])
    out = {r.key: r.rank for r in pagerank(e, n_iter=30).collect()}
    assert out["x"] == out["y"]
    assert out["x"] == pytest.approx(0.15 * SCALE / 0.15, rel=1e-6)


def test_coactivity_hot_bucket_capped(spark):
    # 12 users in one (event_type, hour) cell > max_bucket=10 -> no
    # edges; 2 users in another cell -> one symmetric pair
    rows = [(f"u{i}", _ts(10), "view") for i in range(12)]
    rows += [("a", _ts(7200), "click"), ("b", _ts(7300), "click")]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {(r.src, r.dst) for r in coactivity_edges(df).collect()}
    assert got == {("a", "b"), ("b", "a")}


def test_pagerank_rank_conservation_on_events(spark, events):
    out = pagerank(coactivity_edges(events)).cache()
    try:
        n, tot = out.agg(F.count(F.lit(1)), F.sum("rank")).first()
        base = round(0.15 * SCALE)
        # each superstep redistributes 85% with only div-truncation
        # losses: total stays within (base + 0.85*SCALE) * n of the
        # invariant scale and every rank is >= base
        assert out.filter(F.col("rank") < base).count() == 0
        assert tot <= n * SCALE * 2
    finally:
        out.unpersist()


# --------------------------------------------------------------- theil_sen


def test_theil_sen_exact_line(spark):
    # daily means 10.00, 12.00, 14.00 -> slope exactly 200 centi/day,
    # robust to pair multiplicity
    rows = []
    for d, v in [(0, 10.0), (1, 12.0), (2, 14.0)]:
        rows += [("k", _ts(d * 86400 + j), v) for j in range(3)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    r = theil_sen(df).first()
    assert r.n_days == 3 and r.n_pairs == 3
    assert r.ts_slope == pytest.approx(200.0)


def test_theil_sen_outlier_robust(spark):
    # 9 collinear days (slope 100 centi/day) + one wild outlier day:
    # the median pairwise slope stays at 100; OLS would not
    rows = [("k", _ts(d * 86400), 1.0 + d) for d in range(9)]
    rows.append(("k", _ts(9 * 86400), 1000.0))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    r = theil_sen(df).first()
    assert r.ts_slope == pytest.approx(100.0)


def test_theil_sen_pair_count(spark, events):
    out = theil_sen(events)
    bad = out.filter(
        F.col("n_pairs") != F.col("n_days") * (F.col("n_days") - 1) / 2
    )
    assert bad.count() == 0
