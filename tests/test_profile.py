"""Single-pass data-quality profile vs pandas ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.profile import data_profile


def test_profile_matches_pandas(spark, events):
    got = {
        r["col_name"]: r
        for r in data_profile(events, ["user_id", "event_type", "value"]).collect()
    }
    pdf = events.toPandas()
    for c in ("user_id", "event_type", "value"):
        assert got[c]["n_rows"] == len(pdf)
        assert got[c]["n_null"] == int(pdf[c].isna().sum())
        assert got[c]["n_distinct"] == pdf[c].dropna().nunique()
    assert got["event_type"]["min_s"] == sorted(pdf["event_type"].dropna())[0]


def test_profile_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b string"
    ).select("a", F.col("b").cast("string"))
    out = {r["col_name"]: r for r in data_profile(df).collect()}
    assert out["b"]["n_null"] == 2
    assert out["b"]["n_distinct"] == 0
    assert out["b"]["min_s"] is None and out["b"]["max_s"] is None


def test_profile_is_one_scan_no_collect(spark, events):
    p = data_profile(events)._jdf.queryExecution().executedPlan().toString()
    # one wide aggregate (expand for multi-distinct), no joins/cartesian
    assert "CartesianProduct" not in p and "Join" not in p
    assert "Expand" in p  # Spark's multi-count_distinct strategy
