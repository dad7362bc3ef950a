"""DTW series similarity over PAA representations, SAX-bucketed.

Dynamic time warping on raw million-point series is an O(n*m) pairwise
cost no engine should pay at corpus scale. The production pattern
(iSAX family: Shieh & Keogh KDD'08; UCR suite) is to compare REDUCED
representations: z-normalized PAA vectors of fixed length, with SAX
words as the bucketing key that prunes the pair space to an equi-join
— exactly the MinHash-band / sign-LSH candidate-restriction shape the
dedup operators use (operators/dedup.py). This module composes:

 1. :func:`tits_spark.operators.sax.series_vectors` — one pass to
    (key, PAA vector, SAX word);
 2. a self-equi-join on the first ``prefix`` SAX symbols (key1 < key2)
    — candidate pairs only, never the cross product;
 3. :func:`dtw_numpy` — full unbanded DP over the ``segments``-length
    vectors, vectorized ACROSS pairs in an Arrow batch (the
    segments^2 loop is over scalars-per-pair, numpy ops over the pair
    axis), inside mapInPandas.

Every DP cell is one abs-diff + one add + exact mins, so the distance
is bit-identical to the oracle's unrolled 8x8 SQL chain — the same
determinism discipline as ar_fit's unrolled Levinson.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_numpy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Unbanded DTW cost for each row pair of (P, s) matrices.

    c[i,j] = |x_i - y_j| + min(c[i-1,j], c[i-1,j-1], c[i,j-1]); all
    mins are exact, every cell is one correctly-rounded add, so the
    result is bit-reproducible in any IEEE engine evaluating the same
    recurrence (the oracle unrolls it as chained SQL aliases).
    """
    if x.ndim == 1:
        x, y = x[None, :], y[None, :]
    s = x.shape[1]
    prev = np.empty((x.shape[0], s))
    cur = np.empty_like(prev)
    prev[:, 0] = np.abs(x[:, 0] - y[:, 0])
    for j in range(1, s):
        prev[:, j] = np.abs(x[:, 0] - y[:, j]) + prev[:, j - 1]
    for i in range(1, s):
        cur[:, 0] = np.abs(x[:, i] - y[:, 0]) + prev[:, 0]
        for j in range(1, s):
            best = np.minimum(
                np.minimum(prev[:, j], prev[:, j - 1]), cur[:, j - 1]
            )
            cur[:, j] = np.abs(x[:, i] - y[:, j]) + best
        prev, cur = cur, prev
    return prev[:, s - 1]


def dtw_similar(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    segments: int = 8,
    alphabet: int = 4,
    prefix: int = 2,
    decimals: int = 6,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """(key1, key2, dtw): DTW distance between PAA vectors for every
    candidate pair sharing the first ``prefix`` SAX symbols, key1 <
    key2. ``prefix=0`` disables bucketing (all pairs — the exactness
    baseline, quadratic; label it as such in any pipeline).

    ``vectors``: a precomputed :func:`series_vectors` frame (e.g. a
    written table in an indexing pipeline). When omitted, it is
    computed here and persisted for the duration of the job — a self-
    join otherwise re-derives the whole PAA lineage (raw scan + window
    pass) once PER SIDE, doubling the dominant cost at corpus scale.
    The persisted table is one row per series (tiny next to raw);
    Spark's ContextCleaner reclaims it when the plan is released.
    """
    from tits_spark.operators.sax import series_vectors

    if not 0 <= prefix <= segments:
        raise ValueError("dtw_similar: prefix must be in [0, segments]")
    vecs = (
        vectors
        if vectors is not None
        else series_vectors(df, key, ts, value, segments, alphabet).persist()
    )
    kt = df.schema[key].dataType.simpleString()
    a = vecs.select(
        F.col(key).alias("key1"), F.col("vec").alias("v1"),
        F.substring("word", 1, prefix).alias("_b") if prefix
        else F.lit("").alias("_b"),
    )
    b = vecs.select(
        F.col(key).alias("key2"), F.col("vec").alias("v2"),
        F.substring("word", 1, prefix).alias("_b") if prefix
        else F.lit("").alias("_b"),
    )
    pairs = a.join(b, "_b").where(F.col("key1") < F.col("key2"))

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v1"].to_numpy())
            y = np.stack(pdf["v2"].to_numpy())
            yield pd.DataFrame({
                "key1": pdf["key1"],
                "key2": pdf["key2"],
                "dtw": np.round(dtw_numpy(x, y), decimals),
            })

    # numbered round-robin repartition before the DP stage: the O(n^2)
    # band DP per pair is CPU-bound over compact rows, so AQE's
    # byte-based coalescing of the post-join exchange would serialize
    # it (grouped-UDF trap, BENCH/PLANS.md). Round-robin also rebalances
    # SAX-bucket skew (hot prefixes produce most pairs), and rows are
    # independent so no clustering is required for mapInPandas.
    nparts = pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(nparts).mapInPandas(
        fn, schema=f"key1 {kt}, key2 {kt}, dtw double"
    )
