"""conversion_within / sequence_motifs: hand cases + invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tits_spark.operators.events_analytics import conversion_within, sequence_motifs

UTC = dt.timezone.utc


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=sec)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), t, i) for i, (k, s, t) in enumerate(rows)],
        "user_id string, ts timestamp, event_type string, event_id long",
    )


def test_conv_within_horizons(spark):
    df = _ev(spark, [
        ("u1", 0, "view"), ("u1", 1800, "purchase"),      # within 1h
        ("u1", 4000, "view"), ("u1", 4000 + 7200, "purchase"),  # 2h: 1d only
        ("u1", 90000, "view"),                             # never converts
    ])
    r = conversion_within(df).first()
    assert (r.n_src, r.n_conv, r.n_w3600, r.n_w86400) == (3, 2, 1, 2)
    assert r.rate_w3600 == pytest.approx(1 / 3, abs=1e-6)
    assert r.rate_w86400 == pytest.approx(2 / 3, abs=1e-6)


def test_conv_within_never_converter_zero(spark):
    df = _ev(spark, [("u1", 0, "view"), ("u1", 10, "click")])
    r = conversion_within(df).first()
    assert (r.n_src, r.n_conv, r.n_w3600, r.rate_w3600) == (1, 0, 0, 0.0)


def test_conv_within_rate_bounds(spark, events):
    out = conversion_within(events)
    bad = out.filter(
        (F.col("n_w3600") > F.col("n_w86400"))
        | (F.col("n_w86400") > F.col("n_conv"))
        | (F.col("n_conv") > F.col("n_src"))
        | (F.col("rate_w3600") < 0) | (F.col("rate_w86400") > 1)
    )
    assert bad.count() == 0


def test_motifs_hand_case(spark):
    # stream: v c p v p e e e s v  -> "vcpvpeees v" without the space
    df = _ev(spark, [
        ("u1", i, t) for i, t in enumerate(
            ["view", "click", "purchase", "view", "purchase",
             "error", "error", "error", "signup", "view"]
        )
    ])
    r = sequence_motifs(df).first()
    assert r.seq_len == 10
    assert r.n_vcp == 1
    assert r.n_vp == 1       # the later adjacent 'vp' (pos 4-5)
    assert r.n_ee == 1       # non-overlapping: 'eee' -> one 'ee'
    assert r.n_sv == 1


def test_motifs_tie_order_deterministic(spark):
    # same timestamp: event_id breaks the tie -> 'vp' not 'pv'
    df = _ev(spark, [("u1", 5, "view"), ("u1", 5, "purchase")])
    r = sequence_motifs(df).first()
    assert r.n_vp == 1
