"""Matrix profile: per-series nearest-neighbor subsequence distances.

For each length-``m`` subsequence of a series, the z-normalized
Euclidean distance to its most similar OTHER subsequence of the same
series (neighbors closer than the exclusion zone don't count). Low
values mark motifs (repeated shapes), the maximum marks the top
discord (anomaly) — the UCR matrix-profile framing (Yeh et al. ICDM
2016; STOMP, Zhu et al. ICDM 2016).

Two implementations, same contract:

 - :func:`matrix_profile` — the scale path. One shuffle groups each
   series; inside the grouped Arrow UDF the full profile is computed
   with blocked-GEMM pairwise dot products (the AAMP/SCAMP formulation
   of Zimmerman et al. SoCC'19): ``W_blk @ W.T`` row blocks keep the
   O(w^2) distance matrix out of memory while BLAS does the O(w^2 m)
   flops. Parallelism across series is the 100 TB story, same as
   sacf_by_key.
 - :func:`matrix_profile_decl` — declarative twin, pure DataFrame
   algebra (window frame stats + bounded self-join on window offsets).
   Pair count is (n/m-ish)^2 x m per series, so it is the
   cross-engine-checkable form for modest series, not the scale path.

Determinism: distances are rounded to ``decimals`` BEFORE the argmin
and ties broken by the smaller neighbor index, so the selected
neighbor is stable under ulp-level accumulation differences — the same
quantized-argmax device operators/lttb.py uses. Windows whose variance
is zero (constant subsequence: z-norm undefined) are excluded both as
query and as neighbor; windows with no admissible neighbor are
dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _out_schema(df: DataFrame, key: str) -> str:
    kt = df.schema[key].dataType.simpleString()
    return f"key {kt}, wi int, ts timestamp, mp double, nn int"


def mp_numpy(
    v: np.ndarray, m: int, excl: int, decimals: int = 6,
    mem_budget: int = 16_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(profile, neighbor-index) for one series via blocked GEMM.

    All pairwise window dot products come from ``W_blk @ W.T`` (W is the
    sliding-window view) in row blocks sized so a block's scratch stays
    under ``mem_budget`` doubles — O(w^2 m) flops in BLAS, O(block * w)
    memory, so a 100k-point series never materializes the full w x w
    matrix. profile[i] is NaN when window i is constant or has no
    admissible neighbor. Distances are quantized to ``decimals`` before
    the argmin; np.argmin's first-occurrence rule IS the smaller-
    neighbor-index tie-break the decl twin and oracle use.
    """
    n = v.size
    w = n - m + 1
    if w < 2:
        return np.full(0, np.nan), np.full(0, -1)
    ex = max(excl, 1)
    wins = np.lib.stride_tricks.sliding_window_view(v, m)
    # DIRECT per-window sums (O(w*m), trivial next to the GEMM) — a
    # cumsum-difference formulation absorbs tiny v^2 terms into the
    # running total (found by fuzzing: a 1e-38 value next to a 1.0
    # classifies as zero-variance under cumsum but not under the
    # framed sums the decl twin / SQL oracle evaluate)
    s = wins.sum(axis=1)                      # window sums
    s2 = np.einsum("ij,ij->i", wins, wins)    # window sums of squares
    e = m * s2 - s * s            # m^2 * population variance
    ok = e > 0
    bad = ~ok
    # z-normalized windows, pre-scaled so the GEMM output is already in
    # quantized units: with Y = sqrt(2)*10^decimals * z,
    #   (10^decimals * dist)^2 = 2*10^(2d) * (m - z_i.z_j)
    #                          = 10^(2d)*2m - (Y_i . Y_j)
    # i.e. one contiguous GEMM + subtract/clip/sqrt/rint per block —
    # same values as round(sqrt(2m(1-ratio)), d) to ~1 ulp, and the
    # 1e-6 quantization before the argmin absorbs that (the decl twin /
    # oracle establishes the contract).
    q = 10.0 ** decimals
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt(e) / m       # population std per window
        y = (wins - (s / m)[:, None]) / sd[:, None]
    y[bad] = 0.0                  # constant windows: masked below
    y *= np.sqrt(2.0) * q
    yt = np.ascontiguousarray(y.T)
    lim = 2.0 * m * q * q
    mp = np.full(w, np.nan)
    nn = np.full(w, -1, dtype=np.int64)
    block = max(16, min(w, mem_budget // w))
    g = np.empty((block, w))
    cols = np.arange(w)
    for b0 in range(0, w, block):
        b1 = min(b0 + block, w)
        gb = g[: b1 - b0]
        np.matmul(y[b0:b1], yt, out=gb)
        np.subtract(lim, gb, out=gb)         # (q*dist)^2
        np.maximum(gb, 0.0, out=gb)
        np.sqrt(gb, out=gb)
        np.rint(gb, out=gb)                  # quantized-units distance
        gb[:, bad] = np.inf                  # constant windows: never a neighbor
        # exclusion zone: |i - j| < ex around each row's own index
        for off in range(-ex + 1, ex):
            j = np.arange(b0, b1) + off
            keep = (j >= 0) & (j < w)
            gb[np.nonzero(keep)[0], j[keep]] = np.inf
        best_j = np.argmin(gb, axis=1)       # first occurrence = smallest j
        best_v = gb[np.arange(b1 - b0), best_j]
        good = ok[b0:b1] & np.isfinite(best_v)
        idx = cols[b0:b1][good]
        mp[idx] = best_v[good] / q
        nn[idx] = best_j[good]
    return mp, nn


def matrix_profile(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    m: int = 8,
    excl: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-key matrix profile rows (key, wi, ts, mp, nn); ``ts`` is the
    window-start timestamp, ``wi`` its 0-based index in (ts, value)
    order, ``nn`` the chosen neighbor's window index."""
    if m < 3:
        raise ValueError("matrix_profile: m must be >= 3")
    ex = m // 2 if excl is None else excl

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, value], kind="stable")
        v = pdf[value].to_numpy(np.float64)
        mp, nn = mp_numpy(v, m, ex, decimals)
        w = mp.size
        if not w:
            return pd.DataFrame(columns=["key", "wi", "ts", "mp", "nn"])
        keep = ~np.isnan(mp)
        return pd.DataFrame({
            "key": pdf[key].iloc[0],
            "wi": np.arange(w, dtype=np.int32)[keep],
            "ts": pdf[ts].to_numpy()[:w][keep],
            "mp": mp[keep],
            "nn": nn[keep].astype(np.int32),
        })

    # explicit partition count: the profile stage is CPU-bound, not
    # byte-bound, so AQE's advisory-size coalescing would serialize it
    # onto one task (observed: 150 series -> 1 task). A numbered
    # repartition is exempt from AQE coalescing and satisfies the
    # grouped-UDF's clustered distribution, so no second shuffle.
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.where(F.col(value).isNotNull())
        .repartition(nparts, key)
        .groupBy(key)
        .applyInPandas(fn, schema=_out_schema(df, key))
    )


def discords(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    m: int = 8,
    k: int = 3,
    excl: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Top-``k`` discords per key: the windows FARTHEST from their own
    nearest neighbor — the matrix-profile anomaly ranking (Yeh et al.
    ICDM 2016 §4.2). Ties break toward the smaller window index. Adds a
    ``rank`` column (1 = strongest anomaly)."""
    prof = matrix_profile(df, key, ts, value, m, excl, decimals)
    w = Window.partitionBy("key").orderBy(F.desc("mp"), "wi")
    return prof.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def motifs(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    m: int = 8,
    k: int = 3,
    excl: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Top-``k`` motif windows per key: the CLOSEST-to-neighbor windows
    (repeated shapes), rank 1 = strongest motif; ties to smaller wi."""
    prof = matrix_profile(df, key, ts, value, m, excl, decimals)
    w = Window.partitionBy("key").orderBy("mp", "wi")
    return prof.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def normalized_pattern(pattern) -> tuple[np.ndarray, float]:
    """(z-normalized pattern, sum of its entries) — the exact floats
    :func:`pattern_search` uses; the oracle embeds their repr() so both
    engines evaluate the identical literals."""
    p = np.asarray(pattern, dtype=np.float64)
    if p.size < 3:
        raise ValueError("pattern_search: pattern must have >= 3 points")
    sd = p.std()
    if sd == 0:
        raise ValueError("pattern_search: constant pattern has no shape")
    zq = (p - p.mean()) / sd
    return zq, float(zq.sum())


def pattern_search(
    df: DataFrame,
    pattern,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    k: int = 20,
    decimals: int = 6,
) -> DataFrame:
    """Global top-``k`` windows most similar to ``pattern`` (z-norm
    Euclidean) across ALL series — the matrix-profile AB-join/"pattern
    occurrence" query (MASS/UCR framing, Yeh et al. ICDM 2016 §3).

    Per key: one gemv (windows @ z-normalized pattern) + vectorized
    window stats; each key emits only its local top-k, so the global
    TakeOrdered sees k rows per key, never the windows. Distances are
    quantized to ``decimals`` and the total order (dist, key, wi) makes
    the global cut deterministic. Zero-variance windows are skipped.
    """
    zq, szq = normalized_pattern(pattern)
    m = zq.size

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["key", "wi", "ts", "dist"]
        pdf = pdf.sort_values([ts, value], kind="stable")
        v = pdf[value].to_numpy(np.float64)
        n = v.size
        w = n - m + 1
        if w < 1:
            return pd.DataFrame(columns=cols)
        wins = np.lib.stride_tricks.sliding_window_view(v, m)
        # direct framed sums: same zero-variance rule as the oracle
        # (see mp_numpy — cumsum differences absorb tiny terms)
        s = wins.sum(axis=1)
        e = m * np.einsum("ij,ij->i", wins, wins) - s * s
        ok = e > 0
        if not ok.any():
            return pd.DataFrame(columns=cols)
        qt = wins @ zq
        mu = s / m
        with np.errstate(invalid="ignore", divide="ignore"):
            sd = np.sqrt(e) / m
            ratio = (qt - mu * szq) / sd
            dist = np.sqrt(np.maximum(2.0 * m - 2.0 * ratio, 0.0))
        dq = np.round(dist, decimals)
        wi = np.arange(w)[ok]
        dq = dq[ok]
        order = np.lexsort((wi, dq))[:k]
        pick = wi[order]
        return pd.DataFrame({
            "key": pdf[key].iloc[0],
            "wi": pick.astype(np.int32),
            "ts": pdf[ts].to_numpy()[pick],
            "dist": dq[order],
        })

    nparts = df.sparkSession.sparkContext.defaultParallelism
    local = (
        df.where(F.col(value).isNotNull())
        .repartition(nparts, key)
        .groupBy(key)
        .applyInPandas(
            fn,
            schema=f"key {df.schema[key].dataType.simpleString()}, "
                   "wi int, ts timestamp, dist double",
        )
    )
    return local.orderBy("dist", "key", "wi").limit(k)


def matrix_profile_decl(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    m: int = 8,
    excl: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Declarative twin of :func:`matrix_profile` (same contract).

    Window stats are one framed aggregate; dot products are a bounded
    equi-join on (key, absolute row position) over the exploded offset
    range — never a cartesian product. Intended for cross-engine
    verification and modest series; the UDF path is the scale path.
    """
    if m < 3:
        raise ValueError("matrix_profile: m must be >= 3")
    # floor 1 mirrors mp_numpy's max(excl, 1): a window is never its
    # own neighbor even when the caller disables the exclusion zone
    ex = max(m // 2 if excl is None else excl, 1)
    base = (
        df.where(F.col(value).isNotNull())
        .select(
            F.col(key).alias("k"), F.col(ts).alias("t"), F.col(value).alias("v")
        )
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("k").orderBy("t", "v")) - 1)
    )
    frame = (
        Window.partitionBy("k").orderBy("rn").rowsBetween(0, m - 1)
    )
    stats = (
        base.select(
            "k", "rn", "t",
            F.count(F.lit(1)).over(frame).alias("cnt"),
            F.sum("v").over(frame).alias("s"),
            F.sum(F.col("v") * F.col("v")).over(frame).alias("s2"),
        )
        .where(F.col("cnt") == m)
        .select(
            "k", F.col("rn").alias("wi"), "t", "s",
            (m * F.col("s2") - F.col("s") * F.col("s")).alias("e"),
        )
        .where(F.col("e") > 0)
    )
    # admissible (query, neighbor) pairs, both directions
    pairs = (
        stats.select("k", F.col("wi").alias("i"), F.col("s").alias("si"),
                     F.col("e").alias("ei"), F.col("t").alias("ti"))
        .join(
            stats.select("k", F.col("wi").alias("j"), F.col("s").alias("sj"),
                         F.col("e").alias("ej")),
            "k",
        )
        .where(F.abs(F.col("i") - F.col("j")) >= ex)
    )
    offs = pairs.select(
        "k", "i", "j", "si", "sj", "ei", "ej", "ti",
        F.explode(F.array([F.lit(o) for o in range(m)])).alias("o"),
    )
    v1 = base.select("k", F.col("rn").alias("p1"), F.col("v").alias("x"))
    v2 = base.select("k", F.col("rn").alias("p2"), F.col("v").alias("y"))
    dots = (
        offs.withColumn("p1", F.col("i") + F.col("o"))
        .withColumn("p2", F.col("j") + F.col("o"))
        .join(v1, ["k", "p1"])
        .join(v2, ["k", "p2"])
        .groupBy("k", "i", "j", "si", "sj", "ei", "ej", "ti")
        .agg(F.sum(F.col("x") * F.col("y")).alias("qt"))
    )
    ratio = (
        m * (F.col("qt") - F.col("si") * F.col("sj") / m)
        / (F.sqrt("ei") * F.sqrt("ej"))
    )
    dist = F.sqrt(F.greatest(2.0 * m * (1.0 - ratio), F.lit(0.0)))
    scored = dots.select(
        "k", "i", "j", "ti", F.round(dist, decimals).alias("dq")
    )
    pick = Window.partitionBy("k", "i").orderBy("dq", "j")
    best = (
        scored.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
    )
    return best.select(
        F.col("k").alias("key"), F.col("i").cast("int").alias("wi"),
        F.col("ti").alias("ts"), F.col("dq").alias("mp"),
        F.col("j").cast("int").alias("nn"),
    )
