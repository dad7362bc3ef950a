"""Rollup tier cascade: associativity (cascade == direct) + sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.rollup import (
    rollup_all_tiers,
    rollup_from_raw,
    with_derived,
)


def _prep(transcripts):
    # derived series: y = length(text) (FIXTURES.md §1)
    return transcripts.select(
        "conv_id", "ts", F.length("text").cast("double").alias("value")
    )


def test_cascade_matches_direct(transcripts):
    """1h/1d computed via cascade from 1m must EXACTLY equal computing
    them straight from raw (associativity of all kept aggregates)."""
    raw = _prep(transcripts)
    tiers = rollup_all_tiers(raw)
    for tier in ("1h", "1d"):
        direct = rollup_from_raw(raw, tier=tier)
        casc = tiers[tier]
        # exceptAll both ways == exact multiset equality (incl. float bits)
        assert casc.exceptAll(direct).count() == 0
        assert direct.exceptAll(casc).count() == 0


def test_counts_conserved(transcripts):
    raw = _prep(transcripts)
    tiers = rollup_all_tiers(raw)
    n_raw = raw.count()
    for tier, df in tiers.items():
        agg = df.agg(
            F.sum("n_obs").alias("n"), F.sum("v_sum").alias("s")
        ).collect()[0]
        assert agg["n"] == n_raw, tier
    # sums conserved across tiers (bit-exact per-key is checked by cascade test)
    s1m = tiers["1m"].agg(F.sum("v_sum")).collect()[0][0]
    s1d = tiers["1d"].agg(F.sum("v_sum")).collect()[0][0]
    assert abs(s1m - s1d) < 1e-6 * abs(s1m)


def test_first_last_min_max(transcripts):
    raw = _prep(transcripts)
    t1d = with_derived(rollup_all_tiers(raw)["1d"])
    bad = t1d.filter(
        (F.col("v_min") > F.col("v_max"))
        | (F.col("v_first") < F.col("v_min"))
        | (F.col("v_first") > F.col("v_max"))
        | (F.col("v_last") < F.col("v_min"))
        | (F.col("v_last") > F.col("v_max"))
        | (F.col("v_mean") < F.col("v_min"))
        | (F.col("v_mean") > F.col("v_max"))
        | (F.col("first_ts") > F.col("last_ts"))
    ).count()
    assert bad == 0


def test_generator_deterministic(spark):
    from tits_spark.datagen import generate_transcripts

    a = generate_transcripts(spark, n_convs=20, seed=7, partitions=2)
    b = generate_transcripts(spark, n_convs=20, seed=7, partitions=16)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
