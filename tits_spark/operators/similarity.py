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
