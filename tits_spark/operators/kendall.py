"""Kendall tau-b rank correlation between two irregular series on the
shared LOCF bucket grid — the RANK member of the dependence family
(granger.py: predictive content; transfer_entropy.py: directional
information; cointegration.py: common trend; this: monotone
association robust to any monotone transform of either side).

Alignment is the tits-style grid every other pair-dependence operator
consumes (ref:/root/reference/src/tits.c rollup tiers keep
last-in-bucket; gap-aware alignment): hourly-or-coarser buckets take
each side's LAST tick, gaps LOCF-fill over the key's joint span —
``locf_bucket_grid`` is ONE raw scan, two exchanges, zero joins.

Exactness: the ENTIRE comparison surface is integer. Per key we emit
(n_obs, tie_x, tie_y, tie_xy, n_dis) — pair counts over the n(n-1)/2
grid-row pairs — and tau-b is ONE fixed double expression over those
exact integers, evaluated as a Spark column (F.round half-up, the
repo's cross-engine device), so both engines see identical doubles:

    tot   = n(n-1)/2
    num   = tot - tie_x - tie_y + tie_xy - 2*n_dis   (= nc - nd)
    tau_b = num / sqrt((tot - tie_x) * (tot - tie_y))

Scale design (the 100 TB argument): the oracle's O(n^2) per-key pair
join is exactly what this operator REFUSES to do. n_dis is computed
per key by Knight's O(n log n) merge-sort inversion count (Knight,
JASA 1966, public algorithm: sort rows by (x, y); strict inversions
of y are then exactly the strictly-discordant pairs — x-tied pairs
sort y ascending and contribute none) inside ONE grouped Arrow UDF
over the grid, so the cost per key is n log n and the only exchange
is the grid's own (key) shuffle. Tie counts are unique-count
arithmetic, exact in int64: pairs are < 2^53 for any key under ~95M
grid rows (3 orders past a decade of 1-second buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid


def merge_count_inversions(a: np.ndarray) -> int:
    """Strict inversion count of ``a`` (# pairs i<j with a[i] > a[j])
    by iterative merge counting — O(n log^2 n) with vectorized
    searchsorted merges, no Python-per-element work."""
    n = a.size
    if n < 2:
        return 0
    runs = [a[i : i + 1] for i in range(n)]
    inv = 0
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            left, right = runs[i], runs[i + 1]
            # pairs (l in left, r in right) with l > r: left precedes
            # right in the original order, so each is a strict inversion
            idx = np.searchsorted(left, right, side="right")
            inv += int(left.size * right.size - idx.sum())
            nxt.append(np.sort(np.concatenate((left, right)), kind="mergesort"))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return inv


def _tie_pairs(v: np.ndarray) -> int:
    """sum over tie groups of t*(t-1)/2, exact int."""
    _, counts = np.unique(v, return_counts=True)
    c = counts.astype(np.int64)
    return int((c * (c - 1) // 2).sum())


def kendall_tau(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 21600,
    min_points: int = 4,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key Kendall tau-b between the two sides of the LOCF grid.

    Returns (key, n_obs, tie_x, tie_y, tie_xy, n_dis, tau_b, gamma,
    d_yx, d_xy): the aligned-row count, the three tie-pair counts and
    the strictly-discordant pair count (all exact int64), then tau-b,
    Goodman-Kruskal gamma and the two Somers' D asymmetries — each a
    fixed double tree over the same integers (round 6, NULL when its
    denominator degenerates). Keys appear when >= ``min_points`` grid
    rows have both sides resolved.
    """
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    rows = grid.filter(F.col("xc").isNotNull() & F.col("yc").isNotNull())
    key_t = dict(rows.dtypes)["key"]
    out_schema = (
        f"key {key_t}, n_obs long, tie_x long, tie_y long, "
        "tie_xy long, n_dis long"
    )

    def counts(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["xc"].to_numpy(np.int64)
        y = pdf["yc"].to_numpy(np.int64)
        n = x.size
        if n < min_points:
            return pd.DataFrame(
                {
                    "key": pdf["key"].iloc[:0],
                    "n_obs": pd.Series([], dtype=np.int64),
                    "tie_x": pd.Series([], dtype=np.int64),
                    "tie_y": pd.Series([], dtype=np.int64),
                    "tie_xy": pd.Series([], dtype=np.int64),
                    "n_dis": pd.Series([], dtype=np.int64),
                }
            )
        # Knight: sort by (x, y); strict y-inversions = strictly
        # discordant pairs (x-tied pairs contribute none)
        order = np.lexsort((y, x))
        n_dis = merge_count_inversions(y[order])
        # joint ties: tie-pairs of the (x, y) PAIR — encode as one
        # int128-free composite via unique over the 2-column stack
        xy = np.stack((x, y), axis=1)
        _, c_xy = np.unique(xy, axis=0, return_counts=True)
        c_xy = c_xy.astype(np.int64)
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_obs": [n],
                "tie_x": [_tie_pairs(x)],
                "tie_y": [_tie_pairs(y)],
                "tie_xy": [int((c_xy * (c_xy - 1) // 2).sum())],
                "n_dis": [n_dis],
            }
        )

    # NO repartition here: the grid arrives hash-partitioned by key
    # from its own window chain, and the grouped UDF rides that
    # exchange (asserted by test_kendall_plan_single_scan...); the
    # session's AQE minPartitionSize floor (session.py) keeps the
    # stage parallel without a third exchange.
    agg = (
        rows.select("key", "xc", "yc")
        .groupBy("key")
        .applyInPandas(counts, schema=out_schema)
    )
    tot = F.expr("n_obs * (n_obs - 1) DIV 2")  # exact int64
    # nc + nd and nc - nd, both exact int64 identities over the surface
    npairs = tot - F.col("tie_x") - F.col("tie_y") + F.col("tie_xy")
    num = (npairs - 2 * F.col("n_dis")).cast("double")
    fx = (tot - F.col("tie_x")).cast("double")
    fy = (tot - F.col("tie_y")).cast("double")
    # guarded divisions stay INSIDE their CASE (the ANSI eager-division
    # trap: a shared subexpression can be evaluated outside its branch)
    tau = F.when(
        (tot > F.col("tie_x")) & (tot > F.col("tie_y")),
        F.round(num / F.sqrt(fx * fy), 6) + F.lit(0.0),
    )
    # Goodman-Kruskal gamma and the two Somers' D asymmetries come free
    # from the SAME integer surface (Goodman & Kruskal 1954; Somers
    # 1962, public formulas): gamma ignores all ties; d_yx conditions
    # on the x side (excludes x-tied pairs), d_xy on the y side
    gamma = F.when(
        npairs > 0, F.round(num / npairs.cast("double"), 6) + F.lit(0.0)
    )
    d_yx = F.when(
        tot > F.col("tie_x"), F.round(num / fx, 6) + F.lit(0.0)
    )
    d_xy = F.when(
        tot > F.col("tie_y"), F.round(num / fy, 6) + F.lit(0.0)
    )
    return agg.select(
        "key", "n_obs", "tie_x", "tie_y", "tie_xy", "n_dis",
        tau.alias("tau_b"), gamma.alias("gamma"),
        d_yx.alias("d_yx"), d_xy.alias("d_xy"),
    )
