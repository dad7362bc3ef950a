"""M4 downsampling: point-set properties, tie determinism, plan shape."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.m4 import m4_downsample


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(11)
    n = 500
    pdf = pd.DataFrame({
        "key": ["s"] * n,
        "ts": pd.to_datetime("2026-03-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 86_400_000, n)), unit="ms"),
        "value": rng.normal(50, 10, n).round(2),
    })
    return spark.createDataFrame(pdf, "key string, ts timestamp, value double"), pdf


def test_m4_points_are_bucket_extremes(series):
    df, pdf = series
    got = m4_downsample(df, width_sec=3600).toPandas()
    assert len(got) <= 24
    pdf = pdf.assign(bkt=pdf["ts"].dt.floor("h"))
    for _, row in got.iterrows():
        grp = pdf[pdf["bkt"] == row["bucket_ts"]]
        assert row["n_obs"] == len(grp)
        assert row["ts_first"] == grp["ts"].min()
        assert row["ts_last"] == grp["ts"].max()
        assert row["v_min"] == grp["value"].min()
        assert row["v_max"] == grp["value"].max()
        # each emitted point is a real input row
        for t, v in [
            (row["ts_first"], row["v_first"]),
            (row["ts_last"], row["v_last"]),
            (row["ts_vmin"], row["v_min"]),
            (row["ts_vmax"], row["v_max"]),
        ]:
            assert ((grp["ts"] == t) & (grp["value"] == v)).any()


def test_m4_tie_determinism(spark):
    # two rows share the bucket-min value and two share the first ts:
    # struct order must pick (min ts among v_min) and (min v among ts_first)
    pdf = pd.DataFrame({
        "key": ["t"] * 4,
        "ts": pd.to_datetime([
            "2026-01-01 00:00:00", "2026-01-01 00:00:00",
            "2026-01-01 00:10:00", "2026-01-01 00:20:00",
        ]),
        "value": [5.0, 3.0, 3.0, 9.0],
    })
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    row = m4_downsample(df, width_sec=3600).collect()[0]
    assert row["v_first"] == 3.0  # min value among the tied first ts
    assert row["ts_vmin"] == pd.Timestamp("2026-01-01 00:00:00")  # earliest v_min
    assert row["v_max"] == 9.0 and row["ts_vmax"] == pd.Timestamp(
        "2026-01-01 00:20:00"
    )


def test_m4_partition_invariant(series):
    df, _ = series
    a = sorted(map(tuple, m4_downsample(df, width_sec=3600).collect()))
    b = sorted(
        map(tuple, m4_downsample(df.repartition(7), width_sec=3600).collect())
    )
    assert a == b


def test_m4_single_shuffle_partial_agg(series):
    df, _ = series
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        m4_downsample(df, width_sec=3600).explain("formatted")
    p = buf.getvalue()
    assert p.count("Exchange (") == 1
    assert "partial_min" in p and "partial_max" in p


def test_m4_bad_width(series):
    df, _ = series
    with pytest.raises(ValueError):
        m4_downsample(df, width_sec=0)
