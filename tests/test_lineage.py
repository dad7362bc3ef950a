"""Checkpoint resume: a job killed halfway resumes from the last
committed partition, the resumed result equals a one-shot run exactly,
and re-running a committed partition is a no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tits_spark.lineage import MetricsLog, incremental_rollup, verify_lineage
from tits_spark.operators.rollup import TIER_ORDER, rollup_all_tiers


@pytest.fixture()
def raw(transcripts):
    return transcripts.select(
        "conv_id", "ts", F.length("text").cast("double").alias("value")
    )


def _tiers_equal(spark, tiers_path, raw):
    want = rollup_all_tiers(raw)
    for tier in TIER_ORDER:
        got = spark.read.parquet(f"{tiers_path}/tier={tier}").drop("bucket_date")
        w = want[tier]
        assert got.exceptAll(w).count() == 0, tier
        assert w.exceptAll(got).count() == 0, tier


def test_resume_from_partial_run(spark, raw, tmp_path):
    tiers = str(tmp_path / "tiers")
    metrics = str(tmp_path / "metrics")

    days = sorted(r["d"] for r in raw.select(F.to_date("ts").alias("d")).distinct().collect())
    cut = days[len(days) // 2]

    # first (interrupted) run: only the first half of the days arrived
    first = raw.filter(F.to_date("ts") <= F.lit(cut))
    p1 = incremental_rollup(spark, first, tiers, metrics, job_id="run1")
    assert p1["tier_1m"] > 0

    # resumed run over the FULL input: must process only the remaining days
    p2 = incremental_rollup(spark, raw, tiers, metrics, job_id="run2")
    assert p2["tier_1m"] == len(days) - p1["tier_1m"]

    _tiers_equal(spark, tiers, raw)

    # third run: everything committed -> no partitions processed
    p3 = incremental_rollup(spark, raw, tiers, metrics, job_id="run3")
    assert all(v == 0 for v in p3.values())

    # lineage checksums match recomputation from stored tiers
    bad = verify_lineage(spark, tiers, metrics).filter(~F.col("match")).count()
    assert bad == 0


def test_rerun_is_idempotent(spark, raw, tmp_path):
    tiers = str(tmp_path / "tiers")
    metrics = str(tmp_path / "metrics")
    incremental_rollup(spark, raw, tiers, metrics, job_id="a")

    # wipe the log (simulates lost checkpoint) and re-run everything:
    # dynamic partition overwrite must leave identical data, not dupes
    import shutil

    shutil.rmtree(metrics)
    incremental_rollup(spark, raw, tiers, metrics, job_id="b")
    _tiers_equal(spark, tiers, raw)


def test_lineage_counts(spark, raw, tmp_path):
    tiers = str(tmp_path / "tiers")
    metrics = str(tmp_path / "metrics")
    incremental_rollup(spark, raw, tiers, metrics, job_id="c")
    log = MetricsLog(spark, metrics).read()
    per_stage = {r["stage"]: r["n"] for r in log.groupBy("stage").agg(F.sum("input_count").alias("n")).collect()}
    n_raw = raw.count()
    for stage, n in per_stage.items():
        assert n == n_raw, stage


def test_backfill_reprocesses_changed_days(spark, raw, tmp_path):
    tiers = str(tmp_path / "tiers")
    metrics = str(tmp_path / "metrics")

    days = sorted(
        r["d"] for r in raw.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    late_day = days[1]
    # commit everything EXCEPT some late rows of one day
    wo_late = raw.filter(
        (F.to_date("ts") != F.lit(late_day)) | (F.minute("ts") % 2 == 0)
    )
    held_back = raw.exceptAll(wo_late)
    assert held_back.count() > 0
    incremental_rollup(spark, wo_late, tiers, metrics, job_id="run1")

    # late rows arrive; WITHOUT backfill the committed day stays stale
    p_no = incremental_rollup(spark, raw, tiers, metrics, job_id="run2")
    assert p_no == {"tier_1m": 0, "tier_1h": 0, "tier_1d": 0}

    # WITH backfill only the changed day reprocesses, through all tiers
    p_bf = incremental_rollup(
        spark, raw, tiers, metrics, job_id="run3", backfill=True
    )
    assert p_bf == {"tier_1m": 1, "tier_1h": 1, "tier_1d": 1}
    _tiers_equal(spark, tiers, raw)

    # lineage verifies against the LATEST checksum after the rewrite
    v = verify_lineage(spark, tiers, metrics)
    assert v.filter(~F.col("match")).count() == 0

    # and a further backfill run is a no-op (counts now agree)
    p_again = incremental_rollup(
        spark, raw, tiers, metrics, job_id="run4", backfill=True
    )
    assert p_again == {"tier_1m": 0, "tier_1h": 0, "tier_1d": 0}


def test_calendar_tier_log_driven_recompute(spark, raw, tmp_path):
    """Monthly tier: built from the committed 1d tier, no-op when
    nothing changed, and recomputed ONLY for months whose days got new
    tier_1d commits (late-data backfill path) — pendingness derived
    from the lineage log alone."""
    from tits_spark.lineage import incremental_calendar
    from tits_spark.operators.rollup import rollup_calendar

    tiers, metrics = str(tmp_path / "tiers"), str(tmp_path / "metrics")

    # hold back part of the LAST day (late data for an already-built month)
    last_day = raw.agg(F.max(F.to_date("ts"))).first()[0]
    late = raw.filter(
        (F.to_date("ts") == F.lit(last_day)) & (F.abs(F.xxhash64("conv_id")) % 3 == 0)
    )
    first = raw.exceptAll(late)

    incremental_rollup(spark, first, tiers, metrics, job_id="r1")
    p1 = incremental_calendar(spark, tiers, metrics, unit="month", job_id="r1")
    assert p1["tier_month"] > 0

    # nothing changed -> no-op
    p2 = incremental_calendar(spark, tiers, metrics, unit="month", job_id="r2")
    assert p2 == {"tier_month": 0}

    # late rows arrive; backfill reruns the day through all tiers, and
    # the calendar pass must pick up exactly the one affected month
    incremental_rollup(spark, raw, tiers, metrics, job_id="r3", backfill=True)
    p3 = incremental_calendar(spark, tiers, metrics, unit="month", job_id="r3")
    assert p3 == {"tier_month": 1}

    got = spark.read.parquet(f"{tiers}/tier=month").drop("bucket_date")
    day = spark.read.parquet(f"{tiers}/tier=1d").drop("bucket_date")
    want = rollup_calendar(day, "month")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    bad = verify_lineage(spark, tiers, metrics).filter(~F.col("match")).count()
    assert bad == 0


def test_snapshots_and_time_travel(spark, raw, tmp_path):
    """Commit-log time travel: reading as-of run1's completion (by
    job_id or timestamp) shows exactly run1's partitions; snapshots()
    lists both runs in commit order."""
    from tits_spark.lineage import read_tier_as_of, snapshots

    tiers, metrics = str(tmp_path / "tt"), str(tmp_path / "tm")
    mid = raw.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")).first().m
    first = raw.filter(F.col("ts").cast("double") <= mid)
    incremental_rollup(spark, first, tiers, metrics, job_id="tt1")
    incremental_rollup(spark, raw, tiers, metrics, job_id="tt2")

    snaps = snapshots(spark, metrics).toPandas()
    assert set(snaps["job_id"]) == {"tt1", "tt2"}
    assert (snaps[snaps["stage"] == "tier_1d"]["n_partitions"] > 0).all()

    # by job_id: only the day partitions run1 committed are visible
    got = read_tier_as_of(spark, tiers, metrics, "1d", job_id="tt1")
    want_parts = {
        r["part"]
        for r in MetricsLog(spark, metrics).read()
        .filter((F.col("job_id") == "tt1") & (F.col("stage") == "tier_1d"))
        .select("part").distinct().collect()
    }
    got_parts = {
        str(r["bucket_date"])
        for r in got.select("bucket_date").distinct().collect()
    }
    assert got_parts == want_parts
    full = spark.read.parquet(f"{tiers}/tier=1d")
    assert got.count() < full.count()

    # by timestamp after run2: everything is visible
    upto = MetricsLog(spark, metrics).read().agg(
        F.max("committed_at").alias("t")).first().t
    got_all = read_tier_as_of(spark, tiers, metrics, "1d", as_of=upto)
    assert got_all.count() == full.count()

    with pytest.raises(ValueError):
        read_tier_as_of(spark, tiers, metrics, "1d")
    with pytest.raises(ValueError):
        read_tier_as_of(spark, tiers, metrics, "1d", job_id="nope")
