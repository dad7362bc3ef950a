"""Deterministic synthetic embedding corpus for ANN evaluation.

Vectors are drawn from a planted Gaussian-mixture: C cluster centers on
the unit sphere (driver-side PCG64, O(C*dim) work), each vector = its
cluster's center + isotropic noise. Per-vector randomness is COUNTER
BASED — every Gaussian is derived by splitmix64 hashing of
(seed, vec_id, dim index) and Box-Muller, so the output is
bit-identical regardless of partition layout or executor count (unlike
rand()/randn(), whose draws depend on task split). That makes recall
numbers and golden assertions reproducible across local[N] and a real
cluster.

The mixture is what makes ANN evaluation meaningful: nearest neighbours
concentrate within a cluster, so a bucketing scheme that preserves
locality scores high recall and a broken one visibly does not — a
uniform corpus would give every method near-zero top-k overlap and hide
regressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_M64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def _counter_normals(seed: int, ids: np.ndarray, dim: int) -> np.ndarray:
    """(len(ids), dim) standard normals, a pure function of
    (seed, vec_id, j) — Box-Muller over two splitmix64 uniforms."""
    base = (ids.astype(np.uint64)[:, None] * np.uint64(2 * dim + 2)
            + np.arange(dim, dtype=np.uint64)[None, :]
            + (np.uint64(seed) << np.uint64(32)))
    u1 = (_splitmix64(base) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (_splitmix64(base + np.uint64(dim)) >> np.uint64(11)).astype(
        np.float64) / float(1 << 53)
    u1 = np.maximum(u1, 1e-300)  # log(0) guard
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def cluster_centers(dim: int, n_clusters: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    C = rng.standard_normal((n_clusters, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def generate_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 50,
    sigma: float = 0.35,
    seed: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    partitions: int | None = None,
    cluster_skew: float = 0.0,
) -> DataFrame:
    """Distributed generation: spark.range drives the ids; each Arrow
    batch derives its vectors independently from the counter hash (no
    state crosses batches, no collect, no driver-side corpus).

    ``cluster_skew`` > 0 draws cluster membership Zipf(s=cluster_skew)
    instead of uniformly (cluster k gets mass ~ 1/(k+1)^s), still fully
    counter-deterministic — the regime for stress-testing IVF list
    balance, where a few semantic clusters dominate a real corpus."""
    centers = cluster_centers(dim, n_clusters, seed)
    if cluster_skew > 0:
        w = 1.0 / np.arange(1, n_clusters + 1, dtype=np.float64) ** cluster_skew
        cum = np.cumsum(w / w.sum())
        cum[-1] = 1.0 + 1e-12  # searchsorted guard on u == max
    else:
        cum = None
    bc = spark.sparkContext.broadcast((centers, cum))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cs, cumw = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 2654435761 + 1))
            if cumw is not None:
                u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                cl = np.searchsorted(cumw, u, side="right").astype(np.int64)
                np.clip(cl, 0, Cs.shape[0] - 1, out=cl)
            else:
                cl = (h % np.uint64(Cs.shape[0])).astype(np.int64)
            X = Cs[cl] + sigma * _counter_normals(seed, ids, Cs.shape[1])
            yield pd.DataFrame({
                id_col: ids,
                emb_col: list(X),
                "cluster": cl,
            })

    rng_df = spark.range(n, numPartitions=partitions)
    schema = f"{id_col} long, {emb_col} array<double>, cluster long"
    return rng_df.mapInPandas(gen, schema)
