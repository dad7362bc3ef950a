"""Deterministic token-bucket rate-limiter replay per key.

Admission control replayed over the historical stream: a bucket of
capacity C tokens refills at r tokens/HOUR; each event consumes one
token if available (admitted) or is dropped. Replaying the limiter
answers "what would this policy have done" — the standard capacity
what-if over transcript/event streams.

All state is INTEGER: with time in exact int64 microseconds and
1 token = 10^6 micro-tokens, the refill for a gap of dt_us at
r tokens/hour is floor(r * dt_us / 3600) micro-tokens (exact integer
floor division, deterministic in any engine), so

    b' = min(C * 10^6, b + (r * dt_us) // 3600)
    admit  iff  b' >= 10^6,  then  b'' = b' - 10^6

is a pure BIGINT recursion — no floats anywhere, so the DuckDB
recursive-CTE oracle matches bit-for-bit by construction, and the
result is independent of partitioning (the scan is per-key
sequential: the documented applyInPandas case, O(1) state)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SCHEMA = "key string, eid long, ts timestamp, admitted boolean, tokens_ut long"


def rate_limit_replay(
    df: DataFrame,
    key: str = "key",
    id_col: str = "eid",
    ts: str = "ts",
    capacity: int = 2,
    rate_per_hour: int = 1,
) -> DataFrame:
    """Per-event admission decision under a (capacity, rate/hour)
    token bucket that starts FULL. ``id_col`` breaks simultaneous-event ties
    (which one gets the last token is order-dependent, so the order
    must be total). Returns (key, eid, ts, admitted, tokens_ut) —
    tokens_ut is the post-decision balance in micro-tokens."""
    cap_ut = int(capacity) * 1_000_000
    r = int(rate_per_hour)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, id_col], kind="stable")
        us = pdf[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = len(us)
        adm = np.empty(n, dtype=bool)
        bal = np.empty(n, dtype=np.int64)
        b = cap_ut
        prev = None
        for i in range(n):
            if prev is not None:
                b = min(cap_ut, b + (r * (int(us[i]) - prev)) // 3600)
            if b >= 1_000_000:
                adm[i] = True
                b -= 1_000_000
            else:
                adm[i] = False
            bal[i] = b
            prev = int(us[i])
        return pd.DataFrame({
            "key": pdf[key].to_numpy(),
            "eid": pdf[id_col].to_numpy(np.int64),
            "ts": pdf[ts].to_numpy(),
            "admitted": adm,
            "tokens_ut": bal,
        })

    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key, id_col, ts)
        .repartition(nparts, key)
        .groupBy(key)
        .applyInPandas(fn, schema=_SCHEMA)
    )
