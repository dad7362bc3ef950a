"""Transcript operators: hand-built conversation parity, checksum
order sensitivity, diff detects planted edits/additions."""

from __future__ import annotations

import datetime as dt

from tits_spark.operators.transcript_stats import (
    conversation_stats,
    transcript_checksum,
    transcript_diff,
)

BASE = dt.datetime(2024, 6, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _conv(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _turns(cid, spec, t0=0):
    """spec: list of (role, text, tool, gap_seconds)."""
    rows, t = [], t0
    for i, (role, text, tool, gap) in enumerate(spec):
        t += gap
        rows.append((cid, i, role, text, tool, BASE + dt.timedelta(seconds=t)))
    return rows


def test_conversation_stats_hand_built(spark):
    spec = [
        ("user", "hello there", None, 0),
        ("assistant", "hi! how can I help", None, 3),
        ("user", "run the tests please", None, 10),
        ("assistant", "running them now", "bash", 2),
        ("assistant", "all green, 42 passed", "bash", 30),
        ("user", "thanks", None, 5),
    ]
    df = _conv(spark, _turns("c1", spec))
    r = conversation_stats(df).collect()[0]
    assert r["n_turns"] == 6
    assert r["n_roles"] == 2
    assert r["duration_us"] == 50_000_000
    # adjacency pairs: u->a, a->u, u->a, a->a, a->u => 4 alternations
    assert (r["n_pairs"], r["n_alt"]) == (5, 4)
    assert r["alt_rate"] == 0.8
    assert r["tool_turns"] == 2
    assert r["n_tokens"] == sum(len(t.split()) for _, t, _, _ in spec)
    # responses: user->assistant gaps at turns 1 (3 s) and 3 (2 s);
    # median rank (2+1)//2 = 1 -> the smaller gap, 2 s
    assert r["n_resp"] == 2
    assert r["p50_resp_us"] == 2_000_000


def test_checksum_is_order_and_text_sensitive(spark):
    spec = [
        ("user", "a", None, 0),
        ("assistant", "b", None, 1),
        ("user", "c", None, 1),
    ]
    a = _conv(spark, _turns("c", spec))
    d0 = transcript_checksum(a).collect()[0]["digest"]
    # same texts, swapped turn order -> different digest
    swapped = _turns("c", spec)
    swapped[1], swapped[2] = (
        ("c", 1, "user", "c", None, swapped[2][5]),
        ("c", 2, "assistant", "b", None, swapped[1][5]),
    )
    d1 = transcript_checksum(_conv(spark, swapped)).collect()[0]["digest"]
    assert d0 != d1
    # one character changed -> different digest
    edited = _turns("c", spec)
    edited[1] = ("c", 1, "assistant", "B", None, edited[1][5])
    d2 = transcript_checksum(_conv(spark, edited)).collect()[0]["digest"]
    assert d0 != d2
    # identical rebuild -> identical digest (shuffle-order free)
    d3 = transcript_checksum(
        _conv(spark, list(reversed(_turns("c", spec))))
    ).collect()[0]["digest"]
    assert d0 == d3


def test_transcript_diff_flags_changes(spark):
    base_rows = _turns("same", [("user", "x", None, 0), ("assistant", "y", None, 1)])
    a = base_rows + _turns("edit", [("user", "p", None, 0)]) + _turns(
        "gone", [("user", "z", None, 0)]
    )
    b = base_rows + _turns("edit", [("user", "P", None, 0)]) + _turns(
        "new", [("user", "w", None, 0)]
    )
    got = {
        r["conv_id"]: r["status"]
        for r in transcript_diff(_conv(spark, a), _conv(spark, b)).collect()
    }
    assert got == {"edit": "changed", "gone": "only_a", "new": "only_b"}
