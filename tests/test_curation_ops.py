"""Curation add-ons: connected-component dedup clusters, deterministic
sampling, and sequence packing (two-phase distributed prefix sum)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tits_spark.operators.dedup import dedup_clusters
from tits_spark.operators.packing import chunk_stream
from tits_spark.operators.sampling import (
    hash_fraction_sample,
    stratified_sample_exact,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


class TestDedupClusters:
    def test_two_components_and_chain(self, spark):
        # component A: triangle {1,2,3}; component B: 7-node CHAIN
        # 10-11-...-16 (diameter 6 forces several propagation rounds)
        edges = [(1, 2), (2, 3), (1, 3)] + [(i, i + 1) for i in range(10, 16)]
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(_pairs(spark, edges)).collect()
        }
        assert got == {
            **{n: (1, 3) for n in (1, 2, 3)},
            **{n: (10, 7) for n in range(10, 17)},
        }

    def test_bridged_components_merge(self, spark):
        # two cliques bridged by one edge -> single component, min id wins
        edges = [(5, 6), (6, 7), (20, 21), (7, 20)]
        rows = dedup_clusters(_pairs(spark, edges)).collect()
        assert {r["cluster_id"] for r in rows} == {5}
        assert all(r["cluster_size"] == 5 for r in rows)


class TestSampling:
    def test_fraction_sample_is_partition_invariant(self, spark):
        df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        a = hash_fraction_sample(df, 0.25, seed=7)
        b = hash_fraction_sample(df.repartition(37), 0.25, seed=7)
        ids_a = sorted(r["doc_id"] for r in a.collect())
        ids_b = sorted(r["doc_id"] for r in b.collect())
        assert ids_a == ids_b  # the df.sample() property that does NOT hold
        # uniform-ish: keep rate within a few points of the target
        assert abs(len(ids_a) / 5000 - 0.25) < 0.03

    def test_fraction_sample_seed_changes_selection(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        s0 = {r["doc_id"] for r in hash_fraction_sample(df, 0.2, seed=0).collect()}
        s1 = {r["doc_id"] for r in hash_fraction_sample(df, 0.2, seed=1).collect()}
        assert s0 != s1

    def test_stratified_exact_k_per_stratum(self, spark):
        df = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("lang"),
        )
        out = stratified_sample_exact(df, ["lang"], k=10)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"0": 10, "1": 10, "2": 10}
        # small stratum: takes everything
        tiny = df.filter(F.col("doc_id") < 4)
        assert stratified_sample_exact(tiny, ["lang"], k=10).count() == 4

    def test_stratified_partition_invariant(self, spark):
        df = spark.range(0, 600).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("string").alias("lang"),
        )
        a = {r["doc_id"] for r in stratified_sample_exact(df, ["lang"], 25).collect()}
        b = {
            r["doc_id"]
            for r in stratified_sample_exact(df.repartition(13), ["lang"], 25).collect()
        }
        assert a == b


class TestChunkStream:
    def test_matches_naive_global_window(self, spark):
        # irregular doc ids (gaps) and token counts incl. docs larger
        # than the budget (span several chunks)
        df = spark.range(0, 400).select(
            (F.col("id") * 7 % 1000).alias("doc_id"),
            (F.pmod(F.col("id") * 37, F.lit(900)) + 1).cast("int").alias("n_tokens"),
        ).distinct()
        got = chunk_stream(df, budget=256, n_buckets=16)

        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        naive = df.withColumn(
            "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).select(
            "doc_id",
            "n_tokens",
            "cum_before",
            F.floor(F.col("cum_before") / 256).alias("chunk_id"),
            F.pmod("cum_before", F.lit(256)).cast("long").alias("offset"),
            (
                F.floor((F.col("cum_before") + F.col("n_tokens") + 255) / 256)
                - F.floor(F.col("cum_before") / 256)
            ).alias("n_chunks"),
        )
        g = sorted(map(tuple, got.collect()))
        n = sorted(map(tuple, naive.collect()))
        assert g == n

    def test_no_single_partition_window(self, spark):
        """The scale property: the plan must not contain a global
        (empty-partition-spec) window — that is the serialization trap
        chunk_stream exists to avoid. Only the 16-row bucket-totals
        window may be global; it operates on n_buckets rows, and we
        assert the big-table window is partitioned by bucket."""
        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
        )
        plan = (
            chunk_stream(df, budget=64, n_buckets=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the per-row running sum is windowed BY BUCKET ...
        assert "windowspecdefinition(_bkt" in plan
        # ... and the bucket-totals window (the only global one) runs on
        # the n_buckets-row aggregate, downstream of a hash aggregate
        global_windows = [
            ln for ln in plan.splitlines()
            if "windowspecdefinition(" in ln and "windowspecdefinition(_bkt" not in ln
        ]
        assert len(global_windows) <= 1


def test_dedup_clusters_long_chain_converges_logarithmically(spark):
    """A 300-node path graph has diameter 299 — plain min-label
    propagation would need ~300 rounds; pointer jumping must finish
    well within 12 (log2(300) ~ 8.2 plus slack). small_graph_edges=0
    forces the DISTRIBUTED path (the small-graph union-find fast path
    would trivially pass)."""
    edges = [(i, i + 1) for i in range(1000, 1299)]
    out = dedup_clusters(
        _pairs(spark, edges), max_iter=12, small_graph_edges=0
    ).collect()
    assert len(out) == 300
    assert all(r["cluster_id"] == 1000 and r["cluster_size"] == 300 for r in out)


def test_dedup_clusters_raises_when_not_converged(spark):
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(0, 40)]
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(_pairs(spark, edges), max_iter=1, small_graph_edges=0)


def test_dedup_clusters_fast_path_matches_distributed(spark):
    """The round-6 small-graph union-find fast path must emit exactly
    the distributed loop's labels (min reachable id) and sizes."""
    edges = (
        [(1, 2), (2, 3), (1, 3)]
        + [(i, i + 1) for i in range(10, 16)]
        + [(100, 101), (102, 101), (103, 100)]
    )
    fast = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(_pairs(spark, edges)).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(
            _pairs(spark, edges), small_graph_edges=0
        ).collect()
    }
    assert fast == dist and len(fast) == 14


def test_chunk_stream_empty_input(spark):
    df = spark.range(0, 0).select(
        F.col("id").alias("doc_id"), F.lit(1).cast("int").alias("n_tokens")
    )
    out = chunk_stream(df, budget=128)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "cum_before", "chunk_id", "offset", "n_chunks",
    ]


def test_weighted_sample_inclusion_tracks_weight(spark):
    from tits_spark.operators.sampling import weighted_sample_exact

    # two weight classes, 10x apart; heavy rows must dominate the
    # sample roughly in proportion (ES property), and the selection
    # must be identical across partitioning layouts
    rows = [(i, 1000 if i % 2 == 0 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample_exact(df, k=200, weight_col="w")
    picked = [r.doc_id for r in out.collect()]
    heavy = sum(1 for d in picked if d % 2 == 0)
    assert heavy > 140  # ~10:1 odds per draw -> >>70% heavy
    # determinism across layouts
    out2 = weighted_sample_exact(df.repartition(13), k=200, weight_col="w")
    assert sorted(picked) == sorted(r.doc_id for r in out2.collect())
    ranks = sorted(r.rank for r in out.collect())
    assert ranks == list(range(1, 201))


def test_weighted_sample_strata_and_zero_weights(spark):
    from tits_spark.operators.sampling import weighted_sample_exact

    rows = [(i, "a" if i < 50 else "b", (i % 7) - 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = weighted_sample_exact(
        df, k=5, weight_col="w", strata_cols=["source"]
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r)
        assert r.w > 0  # zero/negative weights never sampled
    assert len(per["a"]) == 5 and len(per["b"]) == 5
