"""The guess_lag pipeline: pairwise lead/lag estimation between keyed
quote streams (ref:guess_lag.c:238-331, SURVEY.md §3.1).

Batch re-expression of the reference's streaming CLI:

  quotes(ts, venue, bid, ask)
    -> melt to per-(venue, side) books, absent sides never enter a book
    -> bounded book: newest MAX_TICKS rows per book (W1)
    -> eligibility: triggers have >= EDG_TICKS rows (use newest
       EDG_TICKS), partners >= LOW_TICKS (P5)
    -> all ordered pairs (trigger, partner), same side, i != j (J1)
    -> per pair: rebase t to trigger's first ts, first-difference the
       prices (W2/W3), kernel XCF at NLAGS lags on the tau grid (Q2)
    -> best-lag argmax with NaN propagation (T1), or full correlogram

Deviation from the reference, documented: the reference replays the
whole loop after *every* input line and fires a trigger exactly when a
book hits EDG_TICKS rows; a batch job sees one snapshot, so each
eligible book fires once on its newest EDG_TICKS rows. The planted-lag
fixture asserts the recovered offsets, not stream replay order.

Scale shape: pair registry is tiny (venues^2) -> broadcast; the heavy
shuffle is the single cogroup on (side, key1, key2); per-book state is
bounded by MAX_TICKS, so task memory is O(1) regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tits_spark.functions import kernels as K
from tits_spark.functions.exprs import ts_seconds
from tits_spark.operators.windows import sliding_last_n

MAX_TICKS = 4096                     # ref:guess_lag.c:81
EDG_TICKS = 3 * MAX_TICKS // 4 + 1   # ref:guess_lag.c:242
LOW_TICKS = 2 * MAX_TICKS // 4 + 1   # ref:guess_lag.c:243
NLAGS = 256                          # ref:guess_lag.c:241
TAU = 0.01                           # ref:guess_lag.c:251

_FULL_SCHEMA = "side string, key1 string, key2 string, lag_time double, xcf double"
_BEST_SCHEMA = "side string, key1 string, key2 string, best_lag double, best_xcf double"


def melt_books(quotes: DataFrame) -> DataFrame:
    """(ts, venue, bid, ask) -> (side, venue, ts, px); a NULL side simply
    produces no row (the reference never appends absent fields)."""
    bid = quotes.filter(F.col("bid").isNotNull()).select(
        F.lit("BID").alias("side"), "venue", "ts", F.col("bid").alias("px")
    )
    ask = quotes.filter(F.col("ask").isNotNull()).select(
        F.lit("ASK").alias("side"), "venue", "ts", F.col("ask").alias("px")
    )
    return bid.unionByName(ask)


def guess_lag(
    quotes: DataFrame,
    best: bool = True,
    max_ticks: int = MAX_TICKS,
    edg_ticks: int | None = None,
    low_ticks: int | None = None,
    nlags: int = NLAGS,
    tau: float = TAU,
) -> DataFrame:
    """Pairwise lead/lag over a quotes table.

    Returns (side, key1, key2, best_lag, best_xcf) when ``best`` else the
    full correlogram rows (side, key1, key2, lag_time, xcf).
    """
    if edg_ticks is None:
        edg_ticks = 3 * max_ticks // 4 + 1
    if low_ticks is None:
        low_ticks = 2 * max_ticks // 4 + 1

    books = sliding_last_n(melt_books(quotes), ["side", "venue"], "ts", max_ticks)
    books = books.select("side", "venue", ts_seconds("ts").alias("t"), "px")

    counts = books.groupBy("side", "venue").agg(F.count(F.lit(1)).alias("n"))
    trig = counts.filter(F.col("n") >= edg_ticks).select(
        "side", F.col("venue").alias("key1")
    )
    part = counts.filter(F.col("n") >= low_ticks).select(
        "side", F.col("venue").alias("key2"), F.col("n").alias("n2")
    )
    pairs = (
        trig.join(part, "side")
        .filter(F.col("key1") != F.col("key2"))
        .select("side", "key1", "key2")
    )

    b1 = books.alias("b1")
    b2 = books.alias("b2")
    side1 = b1.join(
        F.broadcast(pairs.alias("pp1")),
        (F.col("b1.side") == F.col("pp1.side")) & (F.col("b1.venue") == F.col("pp1.key1")),
    ).select(
        F.col("pp1.side").alias("side"), F.col("pp1.key1").alias("key1"),
        F.col("pp1.key2").alias("key2"), F.col("b1.t").alias("t"), F.col("b1.px").alias("px"),
    )
    side2 = b2.join(
        F.broadcast(pairs.alias("pp2")),
        (F.col("b2.side") == F.col("pp2.side")) & (F.col("b2.venue") == F.col("pp2.key2")),
    ).select(
        F.col("pp2.side").alias("side"), F.col("pp2.key1").alias("key1"),
        F.col("pp2.key2").alias("key2"), F.col("b2.t").alias("t"), F.col("b2.px").alias("px"),
    )

    def run_pair(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["side", "key1", "key2", "lag_time", "xcf"] if not best else \
               ["side", "key1", "key2", "best_lag", "best_xcf"]
        if left.empty or right.empty:
            return pd.DataFrame(columns=cols)
        l = left.sort_values("t", kind="stable")
        r = right.sort_values("t", kind="stable")
        # trigger fires on its newest edg_ticks rows (ref fires at n == EDG)
        l = l.iloc[-edg_ticks:]
        t1 = l["t"].to_numpy(np.float64)
        t2 = r["t"].to_numpy(np.float64)
        tref = t1[0]
        # first-difference prices; drop the first element of each book
        # (clean form of ref:guess_lag.c:228-236's synthetic zero slot)
        p1 = np.diff(l["px"].to_numpy(np.float64))
        p2 = np.diff(r["px"].to_numpy(np.float64))
        xcf = K.xcor(t1[1:] - tref, p1, t2[1:] - tref, p2, nlags, tau)
        meta = (l["side"].iloc[0], l["key1"].iloc[0], l["key2"].iloc[0])
        if not best:
            lag_time = (np.arange(-nlags, nlags + 1)) * tau
            return pd.DataFrame({
                "side": meta[0], "key1": meta[1], "key2": meta[2],
                "lag_time": lag_time, "xcf": xcf,
            })
        # reference argmax: first maximal element wins; NaN -> NaN lag
        # (ref:guess_lag.c:286-304)
        bestl = 0
        bestx = xcf[0]
        for k in range(1, xcf.size):
            if xcf[k] > bestx:
                bestx = xcf[k]
                bestl = k
        best_lag = float("nan") if np.isnan(bestx) else (bestl - nlags) * tau
        return pd.DataFrame({
            "side": [meta[0]], "key1": [meta[1]], "key2": [meta[2]],
            "best_lag": [best_lag], "best_xcf": [bestx],
        })

    # numbered repartition on both cogroup children: the XCF stage is
    # the most CPU-per-byte stage in the engine (nlags x n kernel per
    # pair over compact rows), exactly the shape AQE's advisory-size
    # coalescing serializes onto one task. A numbered repartition is
    # exempt from coalescing and its HashPartitioning satisfies the
    # cogroup's clustered distribution on both sides (same keys, same
    # count), so no second shuffle appears (tests/test_plans.py).
    nparts = quotes.sparkSession.sparkContext.defaultParallelism
    keys = ["side", "key1", "key2"]
    return (
        side1.repartition(nparts, *keys).groupBy(*keys)
        .cogroup(side2.repartition(nparts, *keys).groupBy(*keys))
        .applyInPandas(run_pair, schema=_BEST_SCHEMA if best else _FULL_SCHEMA)
    )
