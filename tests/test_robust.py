"""Winsorized per-key stats vs numpy ground truth (type-1 bounds)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tits_spark.operators.robust import winsorized_stats


def _mk(spark, vals: dict[int, np.ndarray]):
    rows = []
    for k, v in vals.items():
        rows.append(pd.DataFrame({"key": k, "value": np.round(v, 2)}))
    return spark.createDataFrame(
        pd.concat(rows, ignore_index=True), "key long, value double"
    )


def test_winsorized_matches_numpy(spark):
    rng = np.random.default_rng(6)
    vals = {
        1: rng.normal(100, 10, 200),
        2: np.concatenate([rng.normal(5, 1, 95), [1e6] * 5]),  # fat tail
    }
    df = _mk(spark, vals)
    got = {r["key"]: r for r in winsorized_stats(df).collect()}
    for k, v in vals.items():
        v = np.round(v, 2)
        s = np.sort(v)
        n = len(v)
        lo = s[max(1, -(-n // 20)) - 1]          # type-1 p05
        hi = s[max(1, -(-(19 * n) // 20)) - 1]   # type-1 p95
        assert got[k]["lo"] == lo and got[k]["hi"] == hi
        assert got[k]["n"] == n
        assert got[k]["n_clip_lo"] == int((v < lo).sum())
        assert got[k]["n_clip_hi"] == int((v > hi).sum())
        wsum = np.clip(v, lo, hi).sum()
        assert got[k]["wsum_s"] == round(wsum * 100)
    # the corrupt tail must not own the winsorized mean
    m2 = got[2]["wsum_s"] / (100 * got[2]["n"])
    assert m2 < 10


def test_winsorized_tiny_and_invalid(spark):
    import pytest

    df = _mk(spark, {1: np.array([3.0])})
    r = winsorized_stats(df).collect()[0]
    assert r["lo"] == r["hi"] == 3.0 and r["n_clip_lo"] == 0
    with pytest.raises(ValueError, match="lo_k"):
        winsorized_stats(df, lo_k=0)


def test_benford_separates_conforming_from_uniform(spark):
    """Values sampled log-uniformly over 4 decades conform to Benford
    (small chi2); uniform [1,10) values concentrate low digits' mass
    on 1-9 equally and blow the statistic up."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as E

    rng = np.random.default_rng(41)
    n = 4000
    conforming = np.round(10 ** rng.uniform(0, 4, n), 2)
    conforming = conforming[conforming > 0]
    uniform = np.round(rng.uniform(1, 10, n), 2)
    pdf = pd.concat(
        [
            pd.DataFrame({"user_id": 1, "value": conforming}),
            pd.DataFrame({"user_id": 2, "value": uniform}),
        ],
        ignore_index=True,
    )
    pdf["event_id"] = np.arange(len(pdf))
    pdf["ts"] = pd.Timestamp("2026-01-01")
    pdf["event_type"] = "x"
    pdf["props"] = ""
    import tempfile
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: r["chi2"] for r in E.q_benford(spark, d).collect()}
    # chi2(8) 1% critical value is ~20.1
    assert out[1] < 30
    assert out[2] > 20 * out[1]


def test_gini_known_values(spark):
    """Equal values -> G ~ 0; one holder of everything -> G -> 1-1/n;
    cross-checked against the direct O(n^2) mean-absolute-difference
    definition on random data."""
    import numpy as np
    import pandas as pd
    import tempfile

    import __spark_entry__ as E

    rng = np.random.default_rng(71)
    equal = np.full(50, 7.0)
    concentrated = np.concatenate([np.full(49, 0.01), [10000.0]])
    random_v = np.round(rng.lognormal(3, 1, 200), 2)
    pdf = pd.concat(
        [
            pd.DataFrame({"user_id": 1, "value": equal}),
            pd.DataFrame({"user_id": 2, "value": concentrated}),
            pd.DataFrame({"user_id": 3, "value": random_v}),
        ],
        ignore_index=True,
    )
    pdf["event_id"] = np.arange(len(pdf))
    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.arange(len(pdf)), unit="m"
    )
    pdf["event_type"] = "x"
    pdf["props"] = ""
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: r["gini"] for r in E.q_gini(spark, d).collect()}
    assert abs(out[1]) < 1e-9
    assert out[2] > 0.95
    # direct definition: G = mean|xi-xj| / (2*mean)
    cents = np.round(random_v * 100)
    mad = np.abs(cents[:, None] - cents[None, :]).mean()
    want = mad / (2 * cents.mean())
    np.testing.assert_allclose(out[3], want, atol=1e-5)


def test_streak_small_exact(spark):
    import pandas as pd
    import tempfile

    import __spark_entry__ as E

    # key 1: above-level runs of lengths 2, 1; key 2: one run of 3
    vals = {1: [150, 150, 50, 150, 50], 2: [100, 100, 100]}
    rows = []
    eid = 0
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((uid, eid, pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
                         "x", float(v), ""))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type", "value", "props"])
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: (r["longest_run"], r["n_runs"]) for r in E.q_streak(spark, d).collect()}
    assert out[1] == (2, 2)
    assert out[2] == (3, 1)
