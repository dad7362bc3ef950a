"""roots job: CLI parity with the reference ``roots`` tool
(ref:roots.c:232-268) and the distributed table mode."""

from __future__ import annotations

import sys

sys.path.insert(0, "jobs")

from roots_job import print_roots_cli, roots_table  # noqa: E402


def test_cli_format_real_roots(capsys):
    # (x-1)(x-2) = 2 - 3x + x^2
    print_roots_cli([2.0, -3.0, 1.0])
    out = capsys.readouterr().out.strip().splitlines()
    assert sorted(float(x) for x in out) == [1.0, 2.0]


def test_cli_format_complex_pair(capsys):
    # x^2 + 1 -> conjugate pair printed as re + imi / re - imi
    print_roots_cli([1.0, 0.0, 1.0])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["0.000000 + 1.000000i", "0.000000 - 1.000000i"]


def test_roots_table_distributed(spark):
    df = spark.createDataFrame(
        [
            ("a", [2.0, -3.0, 1.0]),   # roots 1, 2
            ("b", [1.0, 0.0, 1.0]),    # +-i
            ("c", [-6.0, 11.0, -6.0, 1.0]),  # roots 1, 2, 3
            ("d", [5.0, 0.0]),         # degenerate: leading coef 0 -> dropped
        ],
        "id string, coefs array<double>",
    )
    rows = roots_table(df).collect()
    by_id: dict[str, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((round(r["re"], 6), round(r["im"], 6)))
    assert sorted(by_id["a"]) == [(1.0, 0.0), (2.0, 0.0)]
    assert sorted(by_id["b"]) == [(0.0, -1.0), (0.0, 1.0)]
    assert sorted(x[0] for x in by_id["c"]) == [1.0, 2.0, 3.0]
    assert all(x[1] == 0.0 for x in by_id["c"])
    assert "d" not in by_id
