"""Bucketized interval joins vs the naive BETWEEN formulation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.intervals import (
    interval_overlap_join,
    point_in_interval_join,
)


def _frames(spark, seed=3, n_iv=40, n_pt=300):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-02-01")
    lo = base + pd.to_timedelta(rng.integers(0, 86400 * 10, n_iv), unit="s")
    span = pd.to_timedelta(rng.integers(0, 86400, n_iv), unit="s")
    iv = pd.DataFrame({
        "iv_id": np.arange(n_iv),
        "start_ts": lo,
        "end_ts": lo + span,
    })
    pt = pd.DataFrame({
        "pt_id": np.arange(n_pt),
        "ts": base + pd.to_timedelta(rng.integers(0, 86400 * 10, n_pt), unit="s"),
    })
    return (
        spark.createDataFrame(pt, "pt_id long, ts timestamp"),
        spark.createDataFrame(iv, "iv_id long, start_ts timestamp, end_ts timestamp"),
        pt,
        iv,
    )


def test_point_in_interval_matches_naive(spark):
    pts, ivs, pt, iv = _frames(spark)
    got = (
        point_in_interval_join(pts, ivs, bucket_seconds=3600)
        .select("pt_id", "iv_id")
        .toPandas()
        .sort_values(["pt_id", "iv_id"])
        .reset_index(drop=True)
    )
    cross = pt.merge(iv, how="cross")
    want = (
        cross[(cross["ts"] >= cross["start_ts"]) & (cross["ts"] <= cross["end_ts"])]
        [["pt_id", "iv_id"]]
        .sort_values(["pt_id", "iv_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # exactly-once: no duplicate pairs even for multi-bucket intervals
    assert not got.duplicated().any()


def test_interval_overlap_matches_naive(spark):
    _, ivs, _, iv = _frames(spark, seed=8)
    right = (
        ivs.withColumnRenamed("iv_id", "r_id")
        .withColumnRenamed("start_ts", "r_start_ts")
        .withColumnRenamed("end_ts", "r_end_ts")
    )
    got = (
        interval_overlap_join(ivs, right, bucket_seconds=3600)
        .select("iv_id", "r_id")
        .toPandas()
        .sort_values(["iv_id", "r_id"])
        .reset_index(drop=True)
    )
    r = iv.rename(columns={"iv_id": "r_id", "start_ts": "r_start_ts", "end_ts": "r_end_ts"})
    cross = iv.merge(r, how="cross")
    want = (
        cross[(cross["start_ts"] <= cross["r_end_ts"]) & (cross["r_start_ts"] <= cross["end_ts"])]
        [["iv_id", "r_id"]]
        .sort_values(["iv_id", "r_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert not got.duplicated().any()


def test_interval_join_plan_is_equi_join(spark):
    pts, ivs, _, _ = _frames(spark)
    p = point_in_interval_join(pts, ivs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p)


def test_oversized_interval_raises(spark):
    iv = spark.createDataFrame(
        pd.DataFrame({
            "iv_id": [0],
            "start_ts": [pd.Timestamp("2020-01-01")],
            "end_ts": [pd.Timestamp("2026-01-01")],
        }),
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    pt = spark.createDataFrame(
        pd.DataFrame({"pt_id": [0], "ts": [pd.Timestamp("2021-01-01")]}),
        "pt_id long, ts timestamp",
    )
    with pytest.raises(Exception, match="max_buckets"):
        point_in_interval_join(pt, iv, bucket_seconds=60).count()


def test_inverted_interval_raises(spark):
    iv = spark.createDataFrame(
        pd.DataFrame({
            "iv_id": [0],
            "start_ts": [pd.Timestamp("2026-01-02")],
            "end_ts": [pd.Timestamp("2026-01-01")],
        }),
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    pt = spark.createDataFrame(
        pd.DataFrame({"pt_id": [0], "ts": [pd.Timestamp("2026-01-01")]}),
        "pt_id long, ts timestamp",
    )
    with pytest.raises(Exception, match="invalid interval"):
        point_in_interval_join(pt, iv).count()


def test_point_in_interval_keyed_matches_naive(spark):
    """keys=[...] folds entity columns into the equi-join: pairs only
    within the same key, and the join key in the plan carries both."""
    pts, ivs, pt, iv = _frames(spark, seed=13)
    rng = np.random.default_rng(99)
    pk = rng.integers(0, 3, len(pt))
    ik = rng.integers(0, 3, len(iv))
    pts = pts.withColumn("uid", F.element_at(F.array(*[F.lit(int(x)) for x in pk]), F.col("pt_id").cast("int") + 1))
    ivs = ivs.withColumn("uid", F.element_at(F.array(*[F.lit(int(x)) for x in ik]), F.col("iv_id").cast("int") + 1))
    got = (
        point_in_interval_join(pts, ivs, bucket_seconds=3600, keys=["uid"])
        .select("pt_id", "iv_id")
        .toPandas()
        .sort_values(["pt_id", "iv_id"])
        .reset_index(drop=True)
    )
    p2, i2 = pt.assign(uid=pk), iv.assign(uid=ik)
    cross = p2.merge(i2, on="uid")
    want = (
        cross[(cross["ts"] >= cross["start_ts"]) & (cross["ts"] <= cross["end_ts"])]
        [["pt_id", "iv_id"]]
        .sort_values(["pt_id", "iv_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert not got.duplicated().any()


def test_overlap_keyed_restricts_pairs(spark):
    _, ivs, _, iv = _frames(spark, seed=8)
    left = ivs.withColumn("uid", F.col("iv_id") % 2)
    right = (
        ivs.withColumnRenamed("iv_id", "r_id")
        .withColumnRenamed("start_ts", "r_start_ts")
        .withColumnRenamed("end_ts", "r_end_ts")
        .withColumn("uid", F.col("r_id") % 2)
    )
    got = (
        interval_overlap_join(left, right, bucket_seconds=3600, keys=["uid"])
        .select("iv_id", "r_id")
        .toPandas()
    )
    assert ((got["iv_id"] % 2) == (got["r_id"] % 2)).all()
    unkeyed = (
        interval_overlap_join(
            left.drop("uid"), right.drop("uid"), bucket_seconds=3600
        )
        .select("iv_id", "r_id")
        .toPandas()
    )
    same_key = unkeyed[(unkeyed["iv_id"] % 2) == (unkeyed["r_id"] % 2)]
    assert len(got) == len(same_key)


def test_window_join_matches_pandas(spark, events):
    """kdb-style window join vs a direct pandas recomputation, incl.
    empty windows and inclusive bounds."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.intervals import window_join

    left = events.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("key"), "ts", "value"
    )
    right = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("key"), "ts", "value"
    )
    got = window_join(
        left, right, id_col="event_id", before_sec=3600.0, after_sec=0.0
    ).toPandas().set_index("event_id")
    lp = left.toPandas()
    rp = right.toPandas()
    rp["us"] = rp["ts"].astype("datetime64[us]").astype(np.int64)
    rp["rc"] = np.rint(rp["value"].to_numpy() * 100).astype(np.int64)
    assert len(got) == len(lp)
    for _, row in lp.sample(min(40, len(lp)), random_state=7).iterrows():
        lus = pd.Timestamp(row["ts"]).value // 1000
        m = rp[(rp["key"] == row["key"]) & (rp["us"] >= lus - 3600_000_000)
               & (rp["us"] <= lus)]
        mine = got.loc[row["event_id"]]
        assert mine["n_w"] == len(m)
        assert mine["cents_w"] == (m["rc"].sum() if len(m) else 0)
        if len(m):
            assert mine["last_right_us"] == m["us"].max()
        else:
            assert pd.isna(mine["last_right_us"])


def test_window_join_plan_no_cartesian(spark, events):
    from tits_spark.operators.intervals import window_join

    left = events.select("event_id", F.col("user_id").alias("key"), "ts", "value")
    p = window_join(
        left, left.drop("event_id"), id_col="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
