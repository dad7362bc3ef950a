"""Data-quality profile vs pandas ground truth — exact and sketch modes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.profile import data_profile


def test_profile_matches_pandas(spark, events):
    got = {
        r["col_name"]: r
        for r in data_profile(
            events, ["user_id", "event_type", "value"], approx=False
        ).collect()
    }
    pdf = events.toPandas()
    for c in ("user_id", "event_type", "value"):
        assert got[c]["n_rows"] == len(pdf)
        assert got[c]["n_null"] == int(pdf[c].isna().sum())
        assert got[c]["n_distinct"] == pdf[c].dropna().nunique()
    assert got["event_type"]["min_s"] == sorted(pdf["event_type"].dropna())[0]


def test_profile_approx_auto_sketches_strings(spark, events):
    # default mode: string columns HLL-estimated, the rest exact
    got = {r["col_name"]: r for r in data_profile(events).collect()}
    pdf = events.toPandas()
    assert got["user_id"]["n_distinct"] == pdf["user_id"].dropna().nunique()
    assert got["user_id"]["n_distinct_est"] is None
    for c in ("event_type", "props"):
        assert got[c]["n_distinct"] is None
        true = pdf[c].dropna().nunique()
        est = got[c]["n_distinct_est"]
        # p=12 -> ~1.6% stderr; allow 5% (and exact in the linear range)
        assert abs(est - true) <= max(0.05 * true, 1.0), (c, est, true)
        # the non-distinct stats stay exact in approx mode
        assert got[c]["n_rows"] == len(pdf)
        assert got[c]["n_null"] == int(pdf[c].isna().sum())


def test_profile_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b string"
    ).select("a", F.col("b").cast("string"))
    out = {r["col_name"]: r for r in data_profile(df).collect()}
    assert out["b"]["n_null"] == 2
    assert out["b"]["n_distinct"] is None and out["b"]["n_distinct_est"] == 0.0
    assert out["b"]["min_s"] is None and out["b"]["max_s"] is None
    out = {r["col_name"]: r for r in data_profile(df, approx=False).collect()}
    assert out["b"]["n_distinct"] == 0


def test_profile_exact_split_aggregates_no_sort(spark, events):
    p = (
        data_profile(events, approx=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # r06: count/null/min/max run as a keys-free global aggregate and
    # the multi-distinct counts as a separate hash aggregate — mixing
    # them forced a keyed SortAggregate that fully sorted every wide
    # row before aggregating.  The only join is the 1-row x 1-row
    # cross gluing the two aggregate results back together.
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert "Expand" in p  # Spark's multi-count_distinct strategy
    assert "Sort " not in p  # the wide-row sort must stay gone


def test_profile_approx_no_expand_on_sketched(spark, docs):
    # sketch mode on an all-string selection: NO expand (no exact
    # multi-distinct), estimates arrive via a broadcast join of the
    # bounded register table
    plan = (
        data_profile(docs, ["text", "source"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_profile_job_cli(spark, docs, tmp_path, capsys):
    """The packaged CLI job (jobs/profile_job.py): default auto mode
    sketches string columns; --exact forces the expand plan."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import profile_job

    src = str(tmp_path / "corpus")
    docs.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "prof")
    profile_job.main(["--input", src, "--output", out, "--cores", "inherit"])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["columns_profiled"] == len(docs.columns)
    rows = {r["col_name"]: r for r in payload["profile"]}
    assert rows["doc_id"]["n_distinct"] is not None       # exact for keys
    assert rows["text"]["n_distinct_est"] is not None     # sketched
    # explicit exact mode keeps the original 6-column schema
    out2 = str(tmp_path / "prof2")
    profile_job.main(["--input", src, "--output", out2, "--exact"])
    p2 = spark.read.parquet(out2)
    assert "n_distinct_est" not in p2.columns
