"""JSONL transcripts source: schema'd permissive read, corrupt-line
quarantine, dual timestamp formats."""

from __future__ import annotations

import json

from tits_spark.sources.jsonl_source import read_transcripts_jsonl


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    lines = [
        json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user",
                    "text": "hi", "tool": None, "ts": 1700000000}),
        json.dumps({"conv_id": "c1", "turn_idx": 1, "role": "assistant",
                    "text": "hello", "tool": "search",
                    "ts": "2023-11-14T22:13:21"}),
        '{"conv_id": "c2", "turn_idx": 0, BROKEN',
        json.dumps({"conv_id": None, "turn_idx": 0, "role": "user",
                    "text": "orphan", "tool": None, "ts": 1700000002}),
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(lines) + "\n")
    clean, corrupt = read_transcripts_jsonl(spark, str(p))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in clean.collect()}
    # both timestamp encodings parse to the same instant
    assert len(rows) == 2
    assert str(rows[("c1", 0)]["ts"]) == "2023-11-14 22:13:20"
    assert str(rows[("c1", 1)]["ts"]) == "2023-11-14 22:13:21"
    assert rows[("c1", 1)]["tool"] == "search"
    # the broken line is quarantined verbatim, the null-key row dropped
    bad = corrupt.collect()
    assert len(bad) == 1 and "BROKEN" in bad[0]["raw_line"]
    # the clean frame feeds the rollup path directly
    from tits_spark.operators.rollup import rollup_from_raw

    from pyspark.sql import functions as F

    tier = rollup_from_raw(
        clean.withColumn("value", F.length("text").cast("double")),
        "conv_id", "ts", "value", "1m",
    )
    row = tier.first()
    assert tier.count() == 1 and row["n_obs"] == 2  # both turns, one 1m bucket
