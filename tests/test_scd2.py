from __future__ import annotations

import datetime as dt

from tits_spark.operators.scd2 import scd2_asof, scd2_intervals


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, attr string")


def _at(h):
    return BASE + dt.timedelta(hours=h)


def test_scd2_collapses_runs(spark):
    rows = [
        ("u", _at(0), "a"),
        ("u", _at(1), "a"),
        ("u", _at(2), "b"),
        ("u", _at(3), "b"),
        ("u", _at(4), "b"),
        ("u", _at(5), "a"),
    ]
    out = sorted(
        scd2_intervals(_mk(spark, rows)).collect(), key=lambda r: r.version
    )
    assert [(r.version, r.attr, r.n_events) for r in out] == [
        (1, "a", 2),
        (2, "b", 3),
        (3, "a", 1),
    ]
    # intervals tile the timeline: valid_to == next valid_from
    assert out[0].valid_to == out[1].valid_from == _at(2)
    assert out[1].valid_to == out[2].valid_from == _at(5)
    assert out[2].valid_to is None and out[2].is_current
    assert not out[0].is_current


def test_scd2_asof_picks_exactly_one_version_per_key(spark):
    rows = [
        ("u", _at(0), "a"),
        ("u", _at(2), "b"),
        ("v", _at(1), "x"),
    ]
    iv = scd2_intervals(_mk(spark, rows))
    snap = {r.key: r for r in scd2_asof(iv, _at(1)).collect()}
    assert snap["u"].attr == "a"  # version 2 starts at h2, after the cut
    assert snap["v"].attr == "x"
    # boundary semantics: at exactly the change ts the NEW version wins
    snap2 = {r.key: r for r in scd2_asof(iv, _at(2)).collect()}
    assert snap2["u"].attr == "b"
    # before a key's first version the key is absent
    early = scd2_asof(iv, BASE - dt.timedelta(hours=1)).collect()
    assert early == []
