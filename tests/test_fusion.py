from __future__ import annotations

import pytest

from tits_spark.operators.fusion import rrf_fuse


def _mk(spark, rows):
    return spark.createDataFrame(rows, "query_id long, cand_id long, rank int")


def test_rrf_agreement_outranks_single_system(spark):
    # cand 7 is rank 2 in BOTH systems; cand 1/9 are rank 1 in only one.
    # 2/62 > 1/61, so the agreed-on candidate must fuse to rank 1.
    a = _mk(spark, [(0, 1, 1), (0, 7, 2), (0, 3, 3)])
    b = _mk(spark, [(0, 9, 1), (0, 7, 2), (0, 4, 3)])
    out = sorted(rrf_fuse(a, b).collect(), key=lambda r: r.rank)
    assert out[0].cand_id == 7
    assert out[0].rrf_u6 == int((1 / 62 + 1 / 62) * 1e6)
    # single-system candidates score exactly one term
    one = {r.cand_id: r.rrf_u6 for r in out}
    assert one[1] == int(1e6 / 61)
    # rank-1 singles tie at 1/61 -> cand_id ASC breaks it
    ranks = [r.cand_id for r in out]
    assert ranks.index(1) < ranks.index(9)


def test_rrf_topk_and_per_query_isolation(spark):
    a = _mk(spark, [(q, c, c + 1) for q in (0, 1) for c in range(10)])
    b = _mk(spark, [(q, c, c + 1) for q in (0, 1) for c in range(10)])
    out = rrf_fuse(a, b, topk=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1}
    for q, rows in per_q.items():
        assert len(rows) == 5
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]
        best = min(rows, key=lambda r: r.rank)
        assert best.cand_id == 0
        assert best.rrf_u6 == pytest.approx(int((2 / 61) * 1e6), abs=1)
