from __future__ import annotations

import datetime as dt
import math

from tits_spark.operators.mutual_info import mutual_info_type_hour


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, event_type string")


def test_mi_zero_for_independent_and_ln2_for_deterministic(spark):
    rows = []
    # key "ind": every (type, hour) combination equally often -> MI = 0
    for d in range(4):
        for h in (9, 17):
            for t in ("a", "b"):
                rows.append(("ind", BASE + dt.timedelta(days=d, hours=h), t))
    # key "det": type fully determined by hour (a@9, b@17), balanced ->
    # MI = ln(2)
    for d in range(8):
        rows.append(("det", BASE + dt.timedelta(days=d, hours=9), "a"))
        rows.append(("det", BASE + dt.timedelta(days=d, hours=17), "b"))
    out = {r.key: r for r in mutual_info_type_hour(_mk(spark, rows)).collect()}
    assert out["ind"].mi_u6 == 0
    assert abs(out["det"].mi_u6 - int(math.log(2) * 1e6)) <= 1
    assert out["det"].n == 16 and out["det"].n_cells == 2


def test_mi_partitioning_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(6)
    rows = [
        (
            f"u{int(j)}",
            BASE + dt.timedelta(hours=int(h)),
            ["a", "b", "c"][int(c)],
        )
        for j, h, c in zip(
            rng.integers(0, 5, 500), rng.integers(0, 400, 500), rng.integers(0, 3, 500)
        )
    ]
    df = _mk(spark, rows)
    a = sorted(map(tuple, mutual_info_type_hour(df).collect()))
    b = sorted(map(tuple, mutual_info_type_hour(df.repartition(13)).collect()))
    assert a == b
    assert all(r[3] >= 0 or r[3] >= -1 for r in a)  # MI >= 0 up to lattice slack
