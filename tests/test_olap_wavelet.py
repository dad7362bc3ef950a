"""Round-4 families: moments, cube, records, VWAP, stochastic, Haar —
ground truth via numpy/pandas recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.moments import moment_stats
from tits_spark.operators.olap import cube_profile, record_highs, vwap
from tits_spark.operators.wavelet import haar_energy


def test_moments_match_numpy(spark, events):
    got = (
        moment_stats(
            events.select(F.col("user_id").alias("key"), "value")
        )
        .toPandas()
        .set_index("key")
    )
    pdf = events.select("user_id", "value").toPandas().dropna()
    assert len(got) > 0
    for key, grp in pdf.groupby("user_id"):
        c = np.rint(grp["value"].to_numpy() * 100.0)
        n = c.size
        if n < 8 or np.var(c) == 0:
            assert key not in got.index
            continue
        m1 = c.mean()
        m2 = ((c - m1) ** 2).mean()
        m3 = ((c - m1) ** 3).mean()
        m4 = ((c - m1) ** 4).mean()
        row = got.loc[key]
        np.testing.assert_allclose(row["mean"], m1 / 100.0, rtol=1e-9)
        np.testing.assert_allclose(row["std"], np.sqrt(m2) / 100.0, rtol=1e-9)
        np.testing.assert_allclose(row["skewness"], m3 / m2**1.5, rtol=1e-7)
        np.testing.assert_allclose(row["kurtosis"], m4 / m2**2 - 3.0, rtol=1e-7)
        jb = n / 6.0 * ((m3 / m2**1.5) ** 2 + (m4 / m2**2 - 3.0) ** 2 / 4.0)
        np.testing.assert_allclose(row["jb"], jb, rtol=1e-7)


def test_cube_totals_consistent(spark, events):
    ev = events.select("event_type", F.hour("ts").alias("hr"), "value")
    out = cube_profile(ev).toPandas()
    total = out[(out["event_type"] == "<all>") & (out["hr"] == "<all>")]
    assert len(total) == 1
    n_all = int(total["n"].iloc[0])
    assert n_all == ev.count()
    # each grouping set's n must re-total to the grand total
    by_type = out[(out["event_type"] != "<all>") & (out["hr"] == "<all>")]
    by_hr = out[(out["event_type"] == "<all>") & (out["hr"] != "<all>")]
    fine = out[(out["event_type"] != "<all>") & (out["hr"] != "<all>")]
    assert by_type["n"].sum() == n_all == by_hr["n"].sum() == fine["n"].sum()
    assert by_type["cents"].sum() == total["cents"].iloc[0]


def test_record_highs_match_pandas(spark, events):
    df = events.select(
        F.col("user_id").alias("key"), "ts", "value"
    )
    got = record_highs(df).toPandas()
    pdf = df.toPandas().dropna(subset=["value"])
    for key, grp in pdf.groupby("key"):
        g = grp.sort_values(["ts", "value"], kind="stable")
        cm = g["value"].cummax()
        is_rec = g["value"] >= cm  # first occurrence of each new max
        recs = g[g["value"].to_numpy() > np.concatenate(([-np.inf], cm.to_numpy()[:-1]))]
        mine = got[got["key"] == key].sort_values("record_idx")
        assert len(mine) == len(recs), key
        assert (mine["value"].to_numpy() == recs["value"].to_numpy()).all()
        assert list(mine["record_idx"]) == list(range(1, len(recs) + 1))
    del is_rec


def test_vwap_matches_pandas(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = vwap(
        li.withColumn("_sd", F.col("l_shipdate").cast("timestamp")),
        group="l_suppkey", ts="_sd", price="l_extendedprice",
        qty="l_quantity", unit="month",
    ).toPandas()
    pdf = li.toPandas()
    pdf["m"] = pd.to_datetime(pdf["l_shipdate"]).dt.to_period("M")
    pdf["cents"] = np.rint(pdf["l_extendedprice"] * 100).astype(np.int64)
    pdf["q"] = np.rint(pdf["l_quantity"]).astype(np.int64)
    g = pdf.groupby(["l_suppkey", "m"]).apply(
        lambda x: (x["cents"] * x["q"]).sum() / (100.0 * x["q"].sum()),
        include_groups=False,
    )
    assert len(out) == len(g)
    chk = out.set_index(["grp"]).sort_values("bucket_ts")
    one = chk.loc[chk.index[0]]
    assert ((one["vwap"] > 0) & np.isfinite(one["cum_vwap"])).all()
    # spot-check a few buckets exactly
    sample = out.sample(25, random_state=1)
    for _, r in sample.iterrows():
        want = g.loc[(r["grp"], pd.Timestamp(r["bucket_ts"]).to_period("M"))]
        np.testing.assert_allclose(r["vwap"], want, rtol=1e-12)


def test_stochastic_small_case(spark):
    rows = [("k", pd.Timestamp("2026-01-01") + pd.Timedelta(hours=i), float(v))
            for i, v in enumerate([10, 20, 15, 30, 5])]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts", "value"]),
        "key string, ts timestamp, value double",
    )
    from tits_spark.operators.bars import bars_from_tier, stochastic
    from tits_spark.operators.rollup import rollup_from_raw

    bars = bars_from_tier(rollup_from_raw(df, "key", "ts", "value", "1h"))
    out = (
        stochastic(bars, n=3, d=2)
        .orderBy("bucket_ts")
        .toPandas()
    )
    # bar 0: flat frame -> NULL %K; bar 3 (30): HH=30 LL=15 -> %K=100
    assert np.isnan(out["pct_k"].iloc[0])
    assert out["pct_k"].iloc[3] == 100.0
    # %R is %K - 100 identically
    got_r = out["pct_r"].dropna().to_numpy()
    got_k = out["pct_k"].dropna().to_numpy()
    np.testing.assert_allclose(got_r, got_k - 100.0, atol=1e-6)
    # OBV: each bar has volume 1; signs of close diffs +,-,+,- from bar1
    assert list(out["obv"]) == [0, 1, 0, 1, 0]


def test_haar_energy_conservation(spark, events):
    """Parseval for this normalization: sum(x^2) = 2^L * a_L^2 +
    sum_l 2^l * E_l — checked per key against raw cents."""
    df = events.select(F.col("user_id").alias("key"), "ts", "value")
    out = haar_energy(df, levels=5).toPandas()
    assert len(out) > 0
    pdf = df.toPandas().dropna(subset=["value"])
    keys = out["key"].unique()
    for key in keys[:10]:
        g = pdf[pdf["key"] == key].sort_values(["ts", "value"], kind="stable")
        c = np.rint(g["value"].to_numpy()[:32] * 100.0)
        mine = out[out["key"] == key].set_index("level")
        total = 32.0 * mine.loc[0, "energy"]
        for lv in range(1, 6):
            total += (2.0**lv) * mine.loc[lv, "energy"]
        np.testing.assert_allclose(total, np.dot(c, c), rtol=1e-12)
    # keys with < 32 samples are dropped
    counts = pdf.groupby("key").size()
    assert set(keys) == set(counts[counts >= 32].index)
