"""Good-Turing: brute-force parity on a hand-built vocabulary with a
natural 1..k count ladder; classic smoothing sanity (r* < r when the
ladder decays); dense-vocab pole (no hapaxes -> p0 = 0)."""

from __future__ import annotations

from collections import Counter

from tits_spark.operators.good_turing import good_turing


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_good_turing_brute_force_parity(spark):
    # vocabulary with a decaying frequency ladder: n_1=8, n_2=4,
    # n_3=2, n_5=1 (gap at 4 -> r_star NULL for r=3)
    words = (
        [f"hapax{i}" for i in range(8)]
        + [w for i in range(4) for w in (f"twice{i}",) * 2]
        + [w for i in range(2) for w in (f"triple{i}",) * 3]
        + ["penta"] * 5
    )
    text = " ".join(words)
    got = {r["r"]: r for r in good_turing(_docs(spark, [text])).collect()}
    tf = Counter(words)
    fof = Counter(tf.values())
    n = sum(tf.values())
    assert set(got) == {1, 2, 3, 5}
    assert {r: row["n_r"] for r, row in got.items()} == dict(fof)
    # r* = (r+1) n_{r+1}/n_r where count r+1 is occupied
    assert got[1]["r_star"] == round(2 * fof[2] / fof[1], 6)
    assert got[2]["r_star"] == round(3 * fof[3] / fof[2], 6)
    assert got[3]["r_star"] is None  # count 4 unoccupied
    assert got[5]["r_star"] is None  # tail
    for row in got.values():
        assert row["n_tokens"] == n
        assert row["v_types"] == len(tf)
        assert row["p0"] == round(fof[1] / n, 9)
    # decaying ladder -> mass moves down: r* < r + 1 at r = 1
    assert got[1]["r_star"] < 2.0


def test_good_turing_dense_vocab_pole(spark):
    texts = ["alpha beta alpha beta"] * 6  # every term seen 12 times
    got = good_turing(_docs(spark, texts)).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["r"], row["n_r"]) == (12, 2)
    assert row["p0"] == 0.0
    assert row["r_star"] is None
