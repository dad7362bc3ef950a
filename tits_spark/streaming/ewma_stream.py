"""Streaming time-decayed EWMA with O(1) state per key.

The batch operator (operators/sessionize.ewma_irregular) computes
ewma_i = sum_j<=i v_j e^{-(t_i-t_j)/tau} / sum_j<=i e^{-(t_i-t_j)/tau}
as a ratio of prefix sums. On an unbounded stream the same quantity is
maintained incrementally with exactly TWO floats per key — the decayed
numerator s and denominator c anchored at the last event time T:

    on event (t, v):  d = e^{-(t-T)/tau};  s = s*d + v;  c = c*d + 1

the same bounded-one-pass discipline as the reference's stream push
(ref:guess_lag.c:205-224 appends to fixed state, never re-reads).
Within a micro-batch the scan is vectorized (cumsum of v*e^{t/tau}
rebased to the batch start — no per-row Python), and only the (T, s, c)
triple crosses batches via applyInPandasWithState.

Ordering: events are sorted within each micro-batch; across batches the
stream is assumed per-key time-ordered (the reference's assumption,
SURVEY.md §2.10 — use the watermarked batch path for late-data
correctness).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "t double, s double, c double"
OUTPUT_SCHEMA = "key string, ts timestamp, value double, ewma double"


def make_ewma_fn(tau_seconds: float):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t0, s0, c0 = state.get if state.exists else (None, 0.0, 0.0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts", kind="stable")
            t = (
                pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                / 1e6
            )
            v = pdf["value"].to_numpy(np.float64)
            b = t[0]  # rebase: exponent magnitude bounded by batch span
            g = np.exp((t - b) / tau_seconds)
            num = np.cumsum(v * g)
            den = np.cumsum(g)
            if t0 is not None:
                carry = np.exp((t0 - b) / tau_seconds)
                num = num + s0 * carry
                den = den + c0 * carry
            # S_i = num_i/G_i, C_i = den_i/G_i; the 1/G_i cancels in S/C
            ewma = num / den
            # re-anchor the carried sums at the batch's last event
            t0 = float(t[-1])
            s0 = float(num[-1] / g[-1])
            c0 = float(den[-1] / g[-1])
            yield pd.DataFrame(
                {
                    "key": pdf["key"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "value": v,
                    "ewma": ewma,
                }
            )
        if t0 is not None:
            state.update((t0, s0, c0))

    return fn


def stream_ewma(
    spark: SparkSession,
    source_path: str,
    schema: str,
    out_path: str,
    checkpoint: str,
    tau_seconds: float = 86400.0,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream a parquet directory of (key, ts, value) into per-event
    EWMA rows; state is (T, s, c) per key regardless of stream length."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .groupBy("key")
        .applyInPandasWithState(
            make_ewma_fn(tau_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", out_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
