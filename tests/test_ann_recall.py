"""Recall floors for the approximate similarity paths at non-toy size.

Plan-shape tests (test_plans.py) prove lsh_topk / ivf_topk never scan
all pairs; these tests prove the approximation is *useful* — on a 15k
vector clustered corpus (the regime embedding models produce; see
tits_spark/datagen/embeddings.py) the candidates they do rerank must
contain most of the true top-k. Floors are set ~0.1 under the measured
values in BENCH/ANN.md so host-independent, seed-fixed runs never flap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tits_spark.datagen.embeddings import generate_embeddings
from tits_spark.operators import similarity as S

N, N_QUERIES, DIM, K = 15_000, 30, 64, 10


@pytest.fixture(scope="module")
def corpus_and_truth(spark):
    all_vecs = generate_embeddings(
        spark, N + N_QUERIES, dim=DIM, n_clusters=50, sigma=0.05, seed=0
    ).cache()
    corpus = all_vecs.filter(F.col("vec_id") < N).select("vec_id", "embedding")
    queries = all_vecs.filter(F.col("vec_id") >= N).select("vec_id", "embedding")
    truth = _topk_sets(S.cosine_topk(corpus, queries, k=K))
    yield corpus, queries, truth
    all_vecs.unpersist()


def _topk_sets(df):
    out: dict[int, set] = {}
    for r in df.select("query_id", "vec_id").collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx, truth):
    per_q = [
        len(approx.get(q, set()) & t) / max(1, len(t))
        for q, t in truth.items()
    ]
    return sum(per_q) / len(per_q)


def test_lsh_topk_recall_floor(corpus_and_truth):
    corpus, queries, truth = corpus_and_truth
    approx = _topk_sets(
        S.lsh_topk(corpus, queries, k=K, nbits=8, n_tables=8, dim=DIM))
    assert _recall(approx, truth) >= 0.75


def test_ivf_topk_recall_floor(corpus_and_truth):
    corpus, queries, truth = corpus_and_truth
    approx = _topk_sets(
        S.ivf_topk(corpus, queries, k=K, n_centroids=64, nprobe=2))
    assert _recall(approx, truth) >= 0.90


def test_generator_partition_invariant(spark):
    """Counter-hash determinism: the same ids produce bit-identical
    vectors under different partition layouts (rand()/randn() would
    not)."""
    a = generate_embeddings(spark, 500, dim=8, seed=3, partitions=1)
    b = generate_embeddings(spark, 500, dim=8, seed=3, partitions=7)
    ra = {r["vec_id"]: r["embedding"] for r in a.collect()}
    rb = {r["vec_id"]: r["embedding"] for r in b.collect()}
    assert ra == rb


def test_generator_skewed_clusters_deterministic(spark):
    """cluster_skew plants a Zipf cluster-mass profile (top cluster
    dominates), stays partition-invariant, and leaves the uniform
    path (skew=0) untouched."""
    sk = generate_embeddings(
        spark, 2000, dim=8, n_clusters=10, sigma=0.05, seed=0,
        cluster_skew=1.2,
    )
    counts = {
        r["cluster"]: r["n"]
        for r in sk.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    # Zipf(1.2) over 10 clusters: cluster 0 carries ~2x cluster 1 and
    # >10x cluster 9 in expectation; assert the ordering loosely
    assert counts[0] > 1.5 * counts[1] > 3 * counts.get(9, 1)
    sk2 = generate_embeddings(
        spark, 2000, dim=8, n_clusters=10, sigma=0.05, seed=0,
        cluster_skew=1.2, partitions=7,
    )
    a = {r["vec_id"]: (r["cluster"], tuple(r["embedding"])) for r in sk.collect()}
    b = {r["vec_id"]: (r["cluster"], tuple(r["embedding"])) for r in sk2.collect()}
    assert a == b


def test_ivf_rebalance_caps_list_share_on_skewed_corpus(spark):
    """Plain Lloyd leaves a Zipf-skewed corpus's heaviest semantic
    cluster in ONE list; rebalance_max_share must cap every list at
    the requested corpus share without losing recall (the split cells
    tile the heavy cluster, and a query probes its own sub-cell)."""
    n, n_q = 12_000, 20
    vecs = generate_embeddings(
        spark, n + n_q, dim=32, n_clusters=20, sigma=0.05, seed=0,
        cluster_skew=1.2,
    ).cache()
    corpus = vecs.filter(F.col("vec_id") < n).select("vec_id", "embedding")
    queries = vecs.filter(F.col("vec_id") >= n).select("vec_id", "embedding")

    def max_share(cap):
        C, lids = S.train_ivf_centroids(
            corpus, 64, rebalance_max_share=cap)
        sizes = corpus.select(
            F.explode(S._assign_udf(C, lids, "embedding", top=1)).alias("l")
        ).groupBy("l").count().collect()
        tot = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / tot

    assert max_share(None) > 0.10  # the problem is real on this corpus
    assert max_share(0.05) <= 0.06  # the cap holds (small slack for ties)

    # splitting the heavy cluster spreads its neighbourhoods over
    # several bounded sub-lists, so nprobe must rise to cover them —
    # the honest tradeoff: rerank cost becomes nprobe*cap (bounded,
    # tunable) instead of the input's top-cluster share (unbounded).
    # Measured here: nprobe 2 -> 0.69, 4 -> 0.84, 6 -> 0.92, 8 -> 0.97.
    truth = _topk_sets(S.cosine_topk(corpus, queries, k=K))
    approx = _topk_sets(
        S.ivf_topk(corpus, queries, k=K, n_centroids=64, nprobe=6,
                   rebalance_max_share=0.05))
    assert _recall(approx, truth) >= 0.85
    vecs.unpersist()
