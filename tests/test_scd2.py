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


def test_scd2_null_attr_is_its_own_run(spark):
    # a NULL attr is a change from any non-NULL value, a run of NULLs
    # collapses into ONE version, and version numbering stays dense —
    # the plain `!=` formulation would merge the NULL row into the
    # previous version and then split it in the groupBy
    rows = [
        ("u", _at(0), "a"),
        ("u", _at(1), None),
        ("u", _at(2), None),
        ("u", _at(3), "a"),
        ("w", _at(0), None),  # key that STARTS with a NULL attr
        ("w", _at(1), "b"),
    ]
    out = sorted(
        scd2_intervals(_mk(spark, rows)).collect(),
        key=lambda r: (r.key, r.version),
    )
    got = [(r.key, r.version, r.attr, r.n_events) for r in out]
    assert got == [
        ("u", 1, "a", 1),
        ("u", 2, None, 2),
        ("u", 3, "a", 1),
        ("w", 1, None, 1),
        ("w", 2, "b", 1),
    ]
    # intervals still tile: every valid_to == next valid_from
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    for rs in by_key.values():
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
        assert rs[-1].valid_to is None and rs[-1].is_current
