"""Sketch family: HyperLogLog / count-min / KMV.

Accuracy bounds are asserted against the theoretical error of each
sketch at the configured size (HLL p=8: sigma = 1.04/sqrt(256) = 6.5%,
bound at 3 sigma; KMV k=64: sigma = 1/sqrt(62) = 12.7%); determinism
under repartitioning is the load-bearing property — the integer-scaled
register sum must make the estimate independent of task layout.
"""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.sketches import (
    cms_counts,
    cms_point,
    hll_distinct,
    hll_registers,
    kmv_distinct,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 5000 distinct string items in one group, 300 in another
    big = spark.range(5000).select(
        F.lit("big").alias("g"), F.concat(F.lit("item-"), F.col("id")).alias("it")
    )
    small = spark.range(300).select(
        F.lit("small").alias("g"), F.concat(F.lit("x-"), F.col("id")).alias("it")
    )
    return big.unionByName(small)


def test_hll_accuracy_both_branches(ids):
    rows = {r["grp"]: r for r in hll_distinct(ids, "g", "it", p=8).collect()}
    # raw branch: 5000 >> 2.5 * 256
    assert abs(rows["big"]["hll_est"] - 5000) / 5000 < 3 * 1.04 / math.sqrt(256)
    # linear-counting branch: 300 close to m
    assert rows["small"]["zeros"] > 0
    assert abs(rows["small"]["hll_est"] - 300) / 300 < 0.10


def test_hll_deterministic_under_partitioning(ids):
    a = hll_distinct(ids, "g", "it", p=8).collect()
    b = hll_distinct(ids.repartition(13), "g", "it", p=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_register_table_is_mergeable(ids, spark):
    """max-merging two half-stream register tables == one-pass table
    (the continuous-aggregate property distinct counting needs)."""
    h1 = ids.where(F.crc32("it") % 2 == 0)
    h2 = ids.where(F.crc32("it") % 2 == 1)
    merged = (
        hll_registers(h1, "g", "it")
        .unionByName(hll_registers(h2, "g", "it"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    one_pass = hll_registers(ids, "g", "it")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_pass.collect())
    )


def test_hll_single_shuffle_partial_agg(ids):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hll_registers(ids, "g", "it").explain("formatted")
    p = buf.getvalue()
    assert p.count("Exchange (") == 1
    assert "partial_max" in p


def test_cms_never_underestimates(ids):
    # duplicate stream: item-i appears (i % 7) + 1 times
    stream = ids.where(F.col("g") == "small").select(
        "it", F.explode(F.sequence(F.lit(1), F.crc32("it") % 7 + 1)).alias("_")
    )
    counts = cms_counts(stream, "it", d=4, w=64)
    est = cms_point(counts, stream.select("it"), d=4, w=64)
    exact = stream.groupBy(F.col("it").alias("it2")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    j = est.join(exact, est["it"] == exact["it2"]).collect()
    assert len(j) == 300
    assert all(r["cms_cnt"] >= r["exact"] for r in j)
    # 300 distinct items in 4x64 counters: estimates stay near-exact
    mean_err = sum(r["cms_cnt"] - r["exact"] for r in j) / len(j)
    assert mean_err < 20


def test_cms_sketch_size_is_bounded(ids):
    counts = cms_counts(ids, "it", d=4, w=64)
    assert counts.count() <= 4 * 64


def test_kmv_accuracy_and_exact_fallback(ids):
    rows = {r["grp"]: r for r in kmv_distinct(ids, "g", "it", k=64).collect()}
    assert abs(rows["big"]["kmv_est"] - 5000) / 5000 < 3 / math.sqrt(62)
    # fewer distinct than k -> exact count, flagged by n_min < k
    assert rows["small"]["n_min"] == 64 or rows["small"]["kmv_est"] >= 0
    tiny = {
        r["grp"]: r
        for r in kmv_distinct(
            ids.limit(10), "g", "it", k=64
        ).collect()
    }
    for r in tiny.values():
        assert r["n_min"] < 64 and r["kmv_est"] == float(r["n_min"])


def test_kmv_deterministic_under_partitioning(ids):
    a = kmv_distinct(ids, "g", "it", k=64).collect()
    b = kmv_distinct(ids.repartition(17), "g", "it", k=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_w_power_of_two_enforced(ids):
    with pytest.raises(ValueError):
        cms_counts(ids, "it", d=4, w=60)
    with pytest.raises(ValueError):
        hll_distinct(ids, "g", "it", p=5)


def test_bloom_no_false_negatives_and_merge(spark, events):
    from pyspark.sql import functions as F

    from tits_spark.operators.sketches import bloom_probe, bloom_registers

    items = events.where(F.col("user_id").isNotNull()).select(
        F.col("event_type").alias("grp"), F.col("user_id").cast("string").alias("it")
    )
    regs = bloom_registers(items, "grp", "it", m=1024, k=4)
    probed = bloom_probe(regs, items.distinct(), m=1024, k=4).toPandas()
    # Bloom guarantee: every present item MUST report might_contain
    assert probed["might_contain"].all()
    # ghosts mostly rejected (m=1024 over ~hundreds of users -> fpr < 1)
    ghosts = spark.range(50).select(
        F.lit("view").alias("grp"), F.concat(F.lit("gh_"), "id").alias("it")
    )
    g = bloom_probe(regs, ghosts, m=1024, k=4).toPandas()
    assert (~g["might_contain"]).sum() > 0
    # mergeability: registers from two halves OR-combine to the full table
    h1 = items.where(F.col("it").cast("long") % 2 == 0)
    h2 = items.where(F.col("it").cast("long") % 2 == 1)
    merged = (
        bloom_registers(h1, "grp", "it", m=1024, k=4)
        .unionByName(bloom_registers(h2, "grp", "it", m=1024, k=4))
        .groupBy("grp", "word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert merged.exceptAll(regs).count() == 0 and regs.exceptAll(merged).count() == 0
