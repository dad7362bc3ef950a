"""Gorilla codec: encode∘decode == identity, including pathological
values (FIXTURES.md §5), plus the Spark-level per-(key, day) block
round-trip and the per-turn text invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tits_spark.compression.gorilla import (
    compress_partitions,
    decompress_partitions,
    gorilla_decode,
    gorilla_encode,
)


import pytest as _pytest

_MODE = "fast"


def roundtrip(ts, vals, mode=None):
    t, v = gorilla_decode(
        gorilla_encode(np.asarray(ts), np.asarray(vals), mode=mode or _MODE)
    )
    return t, v


@_pytest.mark.parametrize("mode", ["fast", "tight"])
def test_modes_roundtrip_equivalent(mode):
    rng = np.random.Generator(np.random.PCG64(77))
    ts = np.cumsum(rng.integers(1, 10**9, 5000).astype(np.int64))
    vals = np.round(rng.standard_normal(5000) * 40, 3)
    t, v = roundtrip(ts, vals, mode=mode)
    assert np.array_equal(t, ts)
    assert np.array_equal(v.view(np.uint64), vals.view(np.uint64))


def test_empty_and_single():
    t, v = roundtrip(np.array([], dtype=np.int64), np.array([]))
    assert t.size == 0 and v.size == 0
    t, v = roundtrip([1_700_000_000_000_000], [3.14])
    assert list(t) == [1_700_000_000_000_000] and list(v) == [3.14]


def test_pathological_values():
    ts = np.arange(10, dtype=np.int64) * 1_000_000
    vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e308, -1e-308,
                     7.25, 7.25, np.pi])
    t, v = roundtrip(ts, vals)
    assert np.array_equal(t, ts)
    # bit-exact compare (NaN payloads, signed zeros)
    assert np.array_equal(v.view(np.uint64), vals.view(np.uint64))


def test_irregular_gaps_and_huge_deltas():
    ts = np.array([0, 1, 2, 1_000_000_000_000, 1_000_000_000_001,
                   2_000_000_000_000_000], dtype=np.int64)
    vals = np.array([1.0, 1.0, 2.0, 2.0, -5.5, 1e-30])
    t, v = roundtrip(ts, vals)
    assert np.array_equal(t, ts)
    assert np.array_equal(v, vals)


def test_constant_series_compresses_well():
    ts = np.arange(10_000, dtype=np.int64) * 60_000_000  # regular 1m
    vals = np.full(10_000, 42.0)
    block = gorilla_encode(ts, vals)
    # regular ts -> 1 bit/point, constant vals -> 1 bit/point
    assert len(block) < 10_000 * 0.5  # <4 bits per point total
    t, v = gorilla_decode(block)
    assert np.array_equal(t, ts) and np.array_equal(v, vals)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=300),
    st.randoms(use_true_random=False),
)
def test_roundtrip_property(gaps, rnd):
    ts = np.cumsum(np.asarray(gaps, dtype=np.int64))
    rng = np.random.Generator(np.random.PCG64(rnd.randint(0, 2**31)))
    vals = rng.standard_normal(ts.size) * np.power(
        10.0, rng.integers(-300, 300, ts.size).astype(np.float64)
    )
    t, v = roundtrip(ts, vals)
    assert np.array_equal(t, ts)
    assert np.array_equal(v.view(np.uint64), vals.view(np.uint64))


def test_spark_block_roundtrip(spark, transcripts):
    from pyspark.sql import functions as F

    raw = transcripts.select(
        F.col("conv_id").alias("key"), "ts",
        F.length("text").cast("double").alias("value"),
    ).filter(F.col("key").isin([f"conv{i:08d}" for i in range(40)]))
    blocks = compress_partitions(raw).cache()
    back = decompress_partitions(blocks)
    a = raw.select("key", "ts", "value")
    b = back.select("key", "ts", "value")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # block metadata consistent
    meta = blocks.agg(F.sum("n").alias("n")).collect()[0]
    assert meta["n"] == raw.count()


def test_text_equality_under_stable_order(spark, transcripts, tmp_path):
    """North-rule per-row invariant: per-turn text byte-equality under
    stable (conv_id, turn_idx) ordering through a storage round-trip."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "raw_tier")
    transcripts.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    a = transcripts.select("conv_id", "turn_idx", F.md5("text").alias("h"))
    b = back.select("conv_id", "turn_idx", F.md5("text").alias("h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_encode_groups_byte_identical():
    """Batched cross-group encoder (the mapInPandas hot path) must emit
    blocks byte-identical to per-series gorilla_encode(mode="fast"),
    including 1/2/3-point groups (head/delta/dod boundary cases) and
    xor-zero runs."""
    from tits_spark.compression.gorilla import gorilla_encode_groups

    rng = np.random.Generator(np.random.PCG64(123))
    sizes = [1, 2, 3, 4, 17, 1, 250, 2, 33, 1000]
    series = []
    for s in sizes:
        gaps = np.maximum((rng.lognormal(3, 1.5, s) * 1e6).astype(np.int64), 1)
        t = np.int64(1_700_000_000_000_000) + np.cumsum(gaps)
        v = np.round(rng.normal(100, 5, s), 2)
        if s > 4:
            v[2] = v[1]
            v[3] = v[1]  # exercise xor==0 control bit
        series.append((t, v))
    starts = np.concatenate([[0], np.cumsum([s for s in sizes])[:-1]])
    blocks = gorilla_encode_groups(
        np.concatenate([t for t, _ in series]),
        np.concatenate([v for _, v in series]),
        starts,
    )
    assert len(blocks) == len(sizes)
    for blk, (t, v) in zip(blocks, series):
        assert blk == gorilla_encode(t, v, mode="fast")
        dt, dv = gorilla_decode(blk)
        assert np.array_equal(dt, t)
        assert np.array_equal(dv.view(np.uint64), v.view(np.uint64))


def test_decode_blocks_matches_per_point():
    """Transposed batched decoder == per-point gorilla_decode for both
    encoder modes, pathological values, empty blocks, and across the
    big-block fallback threshold."""
    from tits_spark.compression.gorilla import gorilla_decode_blocks

    rng = np.random.Generator(np.random.PCG64(9))
    blocks, truth = [], []
    for mode in ("fast", "tight"):
        for s in [1, 2, 3, 17, 300, 1, 5, 700]:
            gaps = np.maximum((rng.lognormal(3, 1.6, s) * 1e6).astype(np.int64), 1)
            gaps[::7] += np.int64(1) << 40  # 32/64-bit dod classes
            t = np.int64(1_700_000_000_000_000) + np.cumsum(gaps)
            v = np.round(rng.normal(100, 5, s), 2)
            if s > 10:
                v[5], v[6], v[7] = np.inf, -0.0, np.nan
            blocks.append(gorilla_encode(t, v, mode=mode))
            truth.append((t, v))
    blocks.append(gorilla_encode(np.array([], np.int64), np.array([])))
    truth.append((np.array([], np.int64), np.array([])))

    ts_l, vs_l = gorilla_decode_blocks(blocks, big_threshold=400)
    for i, (t, v) in enumerate(truth):
        ref_t, ref_v = gorilla_decode(blocks[i])
        assert np.array_equal(ref_t, t)
        assert np.array_equal(ts_l[i], t)
        assert np.array_equal(
            vs_l[i].view(np.uint64), np.asarray(v, np.float64).view(np.uint64)
        )
