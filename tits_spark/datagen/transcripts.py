"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string, ts: timestamp)

Generation is itself a distributed Spark job: each conversation is
produced by an RNG seeded by (seed, conv_id), inside mapInPandas, so the
output is deterministic regardless of partitioning/parallelism and the
generator would still work at 10^12 turns on a real cluster (no
driver-side materialization).

Design choices mirroring the reference's test inputs (SURVEY.md §5):
 - skewed conversation sizes (Pareto alpha~1.2) to exercise salting,
 - irregular intra-conversation gaps: lognormal seconds with 5% long
   stalls (>1h) -> real gaps for LOCF / linear interpolation,
 - strictly increasing ts per conv_id; (conv_id, turn_idx) is the stable
   order the per-row text-equality invariant is defined over.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_TOOLS = [
    "search", "browser", "python", "bash", "calculator", "sql",
    "retrieval", "editor", "compiler", "planner", "mailer", "scheduler",
]

# deterministic token soup vocabulary (no external data)
_CONSONANT = list("bcdfghjklmnpqrstvwz")
_VOWEL = list("aeiou")


def _build_vocab(seed: int, size: int = 1024) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x5EED))
    words = []
    for _ in range(size):
        n_syll = int(rng.integers(1, 4))
        w = "".join(
            _CONSONANT[int(rng.integers(len(_CONSONANT)))]
            + _VOWEL[int(rng.integers(len(_VOWEL)))]
            for _ in range(n_syll * 2)
        )
        words.append(w)
    return np.asarray(words, dtype=object)


def _gen_conv(conv_idx: int, seed: int, vocab: np.ndarray,
              max_turns: int, epoch_us: int) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64((seed << 32) ^ conv_idx))
    # Pareto-skewed turn counts: many small convs, few huge ones
    n_turns = min(max_turns, 2 + int(8.0 * (rng.pareto(1.2) + 0.25)))

    idx = np.arange(n_turns, dtype=np.int32)
    roles = np.where(idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(n_turns) < 0.10
    roles[tool_mask] = "tool"
    tools = np.full(n_turns, "", dtype=object)
    tools[tool_mask] = [ _TOOLS[int(k)] for k in rng.integers(0, len(_TOOLS), int(tool_mask.sum())) ]

    # text: token soup, lognormal char-lengths clipped to [20, 4000]
    lens = np.clip(rng.lognormal(mean=4.6, sigma=0.9, size=n_turns), 20, 4000).astype(int)
    texts = np.empty(n_turns, dtype=object)
    for i in range(n_turns):
        n_tok = max(3, lens[i] // 7)
        toks = vocab[rng.integers(0, len(vocab), n_tok)]
        texts[i] = " ".join(toks)[: lens[i]]

    # irregular gaps: lognormal seconds (median ~20s), 5% stalls > 1h
    gaps = rng.lognormal(mean=3.0, sigma=1.3, size=n_turns)
    stall = rng.random(n_turns) < 0.05
    gaps[stall] += 3600.0 + rng.exponential(3600.0, int(stall.sum()))
    gaps_us = np.maximum((gaps * 1e6).astype(np.int64), 1)  # strictly increasing
    start_us = epoch_us + int(rng.integers(0, 30 * 86400)) * 1_000_000
    ts_us = start_us + np.cumsum(gaps_us)

    return pd.DataFrame({
        "conv_id": np.full(n_turns, f"conv{conv_idx:08d}", dtype=object),
        "turn_idx": idx,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": pd.to_datetime(ts_us, unit="us"),
    })


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    max_turns: int = 50_000,
    epoch: str = "2026-01-01",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts DataFrame (same content at any parallelism)."""
    epoch_us = int(pd.Timestamp(epoch).value // 1000)
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _build_vocab(seed)
        for pdf in batches:
            for conv_idx in pdf["id"].to_numpy():
                yield _gen_conv(int(conv_idx), seed, vocab, max_turns, epoch_us)

    ids = spark.range(0, n_convs, numPartitions=partitions)
    return ids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
