"""Similarity search over embedding columns (array<float>).

 - ``cosine_topk``: brute-force top-k — the exactness baseline. The
   query set is broadcast (it's small by construction); the scan side
   streams, dot products run as built-in higher-order functions
   (zip_with + aggregate) inside codegen, and per-query top-k is a
   ranking window. One shuffle (by query id) regardless of corpus size.
 - ``lsh_topk``: the scale path — random-hyperplane sign buckets
   (deterministic seeded planes), equi-join on bucket, exact rerank
   inside the bucket. Probe multiple hash tables to trade recall for
   fan-out. At 10^11 vectors the bucket join replaces the full scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def with_cosine(pairs: DataFrame, a: str = "emb_a", b: str = "emb_b") -> DataFrame:
    ca, cb = F.col(a), F.col(b)
    return pairs.withColumn("cosine", _dot(ca, cb) / (_norm(ca) * _norm(cb)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for every query row.
    Returns (query_id, vec_id, cosine, rank). Embeddings are cast to
    double before the arithmetic so results are precision-stable."""
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"), dbl(emb_col).alias("q_emb")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), dbl(emb_col).alias("c_emb"))
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("c_emb"))
         / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_mod: int = 1,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means over a deterministic sample
    (vec_id % sample_mod == 0 — reproducible at any parallelism, unlike
    DataFrame.sample). The sample is collected to the driver: centroid
    training needs only O(n_centroids * dim * sample) work, the corpus
    itself never leaves the executors."""
    rows = (
        corpus.filter((F.col(id_col) % sample_mod) == 0)
        .select(emb_col)
        .toPandas()[emb_col]
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    rng = np.random.Generator(np.random.PCG64(seed))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        for j in range(C.shape[0]):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / (np.linalg.norm(c) + 1e-12)
    return C


def _assign_udf(centroids: np.ndarray, emb_col: str, top: int = 1):
    """pandas_udf assigning each embedding to its ``top`` nearest
    centroids (vectorized matmul per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    C = centroids

    def assign_fn(embs):
        X = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
        sims = X @ C.T
        idx = np.argsort(-sims, axis=1)[:, :top]
        import pandas as pd

        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    assign = pandas_udf(assign_fn, "array<int>")
    return assign(F.col(emb_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in inverted lists
    keyed by their nearest coarse centroid; each query probes its
    ``nprobe`` nearest lists and reranks exactly. At 10^11 vectors the
    per-query work drops to nprobe/n_centroids of the corpus, and the
    list assignment is a one-off batch job whose output can be bucketed
    on the centroid id for co-located probe joins."""
    C = train_ivf_centroids(corpus, n_centroids, id_col, emb_col, seed=seed)
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    c_assigned = corpus.select(
        F.col(id_col).alias("vec_id"), dbl(emb_col).alias("c_emb"),
        F.explode(_assign_udf(C, emb_col, top=1)).alias("list_id"),
    )
    q_assigned = queries.select(
        F.col(id_col).alias("query_id"), dbl(emb_col).alias("q_emb"),
        F.explode(_assign_udf(C, emb_col, top=nprobe)).alias("list_id"),
    )
    cand = c_assigned.join(F.broadcast(q_assigned), "list_id").filter(
        F.col("vec_id") != F.col("query_id")
    ).dropDuplicates(["query_id", "vec_id"])
    scored = cand.select(
        "query_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("c_emb"))
         / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(dim: int, nbits: int, table: int, seed: int) -> list[list[float]]:
    rng = np.random.Generator(np.random.PCG64((seed << 16) ^ table))
    return rng.standard_normal((nbits, dim)).tolist()


def lsh_bucket(emb_col, planes: list[list[float]]):
    """Sign-bucket id of an embedding under fixed hyperplanes (column expr)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(emb_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    nbits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of
    same-sign-bucket vectors, exact cosine rerank on candidates.
    Returns (query_id, vec_id, cosine, rank)."""
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    q = queries.select(F.col(id_col).alias("query_id"), dbl(emb_col).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("vec_id"), dbl(emb_col).alias("c_emb"))

    cand = None
    for t in range(n_tables):
        planes = _planes(dim, nbits, t, seed)
        qb = q.withColumn("bucket", lsh_bucket(F.col("q_emb"), planes))
        cb = c.withColumn("bucket", lsh_bucket(F.col("c_emb"), planes))
        hits = cb.join(F.broadcast(qb), "bucket").select(
            "query_id", "q_emb", "vec_id", "c_emb"
        )
        cand = hits if cand is None else cand.unionByName(hits)

    cand = cand.filter(F.col("vec_id") != F.col("query_id")).dropDuplicates(
        ["query_id", "vec_id"]
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (_dot(F.col("q_emb"), F.col("c_emb"))
         / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
