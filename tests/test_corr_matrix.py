"""All-pairs bucket-aligned Pearson correlation vs numpy ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tits_spark.operators.corr_matrix import corr_matrix


def _mk(spark, series: dict[int, np.ndarray]):
    base = pd.Timestamp("2026-01-01")
    rows = []
    for k, v in series.items():
        ts = base + pd.to_timedelta(np.arange(len(v)), unit="h") + pd.Timedelta("5min")
        rows.append(pd.DataFrame({"key": k, "ts": ts, "value": np.round(v, 2)}))
    pdf = pd.concat(rows, ignore_index=True)
    return spark.createDataFrame(pdf, "key long, ts timestamp, value double"), pdf


def test_corr_matrix_matches_numpy(spark):
    rng = np.random.default_rng(4)
    base_sig = rng.normal(10, 2, 48)
    series = {
        1: base_sig + rng.normal(0, 0.1, 48),       # ~r=+1 with 2
        2: base_sig + rng.normal(0, 0.1, 48),
        3: -base_sig + rng.normal(0, 0.1, 48),      # ~r=-1 with 1,2
        4: rng.normal(5, 1, 48),                    # independent
    }
    df, pdf = _mk(spark, series)
    got = {
        (r["key_a"], r["key_b"]): r["r"]
        for r in corr_matrix(df, tier="1h", min_buckets=8).collect()
    }
    # numpy truth on the integer-cent bucket totals (one obs per bucket)
    cents = {k: np.round(np.round(v, 2) * 100) for k, v in series.items()}
    for (a, b), r in got.items():
        want = np.corrcoef(cents[a], cents[b])[0, 1]
        np.testing.assert_allclose(r, want, atol=2e-6)
    assert got[(1, 2)] > 0.99 and got[(1, 3)] < -0.99
    assert abs(got[(1, 4)]) < 0.5


def test_corr_matrix_drops_constant_and_sparse(spark):
    rng = np.random.default_rng(7)
    series = {
        1: rng.normal(0, 1, 40),
        2: np.full(40, 3.0),          # zero variance -> dropped
        3: rng.normal(0, 1, 4),       # < min_buckets shared -> dropped
    }
    df, _ = _mk(spark, series)
    pairs = {
        (r["key_a"], r["key_b"])
        for r in corr_matrix(df, tier="1h", min_buckets=8).collect()
    }
    assert pairs == set()  # 1-2 has a constant side, 1-3 too few buckets


def test_corr_matrix_plan_equi_join(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    q = corr_matrix(ev)
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
