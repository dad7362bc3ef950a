"""Deterministic quotes fixture for the guess_lag pipeline (FIXTURES.md §4).

Mirrors the reference stdin tick format `sec.nsec \\t ECN \\t bid \\t ask`
(ref:guess_lag.c:119-224) as a table (ts, venue, bid, ask). One venue
leads; follower venues replay the leader's quotes delayed by known
offsets, so the pipeline's best-lag output must recover the planted
offsets on the tau grid.

Prices are a random walk in decimal quanta (1e-4), stored as doubles
(exactly representable scale); ~15% of rows carry only one side --
the absent side is NULL, matching the reference where an absent field
simply never reaches the book (ref:guess_lag.c:205-224).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

QUOTES_SCHEMA = "ts timestamp, venue string, bid double, ask double"


def generate_quotes(
    spark: SparkSession,
    n_ticks: int = 20_000,
    seed: int = 42,
    lag_ms: dict[str, int] | None = None,
    leader: str = "LEAD",
    epoch: str = "2026-02-01",
) -> DataFrame:
    """Quotes table with planted lead/lag structure.

    lag_ms maps follower venue -> delay in milliseconds behind `leader`
    (defaults: FOLA=30ms, FOLB=70ms).
    """
    if lag_ms is None:
        lag_ms = {"FOLA": 30, "FOLB": 70}
    rng = np.random.Generator(np.random.PCG64(seed))
    epoch_us = int(pd.Timestamp(epoch).value // 1000)

    # leader: irregular ticks ~ exp(10ms) apart, price random walk in 1e-4 quanta
    gaps_us = np.maximum(rng.exponential(10_000.0, n_ticks).astype(np.int64), 1)
    t_us = epoch_us + np.cumsum(gaps_us)
    steps = rng.integers(-3, 4, n_ticks)  # quanta steps
    mid_q = 10_000_0 + np.cumsum(steps)   # ~10.0000 in 1e-4 quanta
    spread_q = rng.integers(1, 4, n_ticks)
    bid = (mid_q - spread_q) / 1e4
    ask = (mid_q + spread_q) / 1e4

    frames = []
    for venue, off in [(leader, 0)] + [(v, ms) for v, ms in lag_ms.items()]:
        # follower noise: small jitter on the delay so it's not degenerate
        jit = rng.integers(-500, 501, n_ticks) if off else np.zeros(n_ticks, dtype=np.int64)
        frames.append(pd.DataFrame({
            "ts": pd.to_datetime(t_us + off * 1000 + jit, unit="us"),
            "venue": venue,
            "bid": bid,
            "ask": ask,
        }))
    pdf = pd.concat(frames, ignore_index=True).sort_values("ts", kind="stable")

    # ~15% one-sided rows: drop bid or ask
    drop = rng.random(len(pdf))
    pdf.loc[drop < 0.075, "bid"] = np.nan
    pdf.loc[(drop >= 0.075) & (drop < 0.15), "ask"] = np.nan
    pdf = pdf.reset_index(drop=True)
    return spark.createDataFrame(pdf, schema=QUOTES_SCHEMA)
