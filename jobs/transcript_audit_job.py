"""spark-submit entry point for transcript-migration validation: the
north-rule invariant ("per-turn text equality under stable
(conv_id, turn_idx) ordering") as a production job.

Given one transcripts table, writes per-conversation turn-stream
statistics, the order-sensitive text digest, and the tool-loop audit
(longest same-tool run / ABAB alternation chain — the stuck-agent
screen). Given a --compare
table too, also writes the digest diff (changed / only_a / only_b) —
the readout a 10^12-turn backfill runs after every rewrite, with only
(conv_id, digest) pairs ever crossing the shuffle.

    spark-submit --py-files tits_spark.zip jobs/transcript_audit_job.py \\
        --input   /data/transcripts      # (conv_id, turn_idx, role,
                                         #  text, tool, ts)
        --output  /data/audit            # stats + checksums out
        [--compare /data/transcripts_v2] # optional second snapshot

Prints ONE JSON line:
  {"convs": N, "turns": T, "changed": C, "only_a": A, "only_b": B,
   "loop_convs": L, "worst_run": W, "sec": S}
(diff fields -1 when --compare is absent; loop_convs counts
conversations with a same-tool run >= 5 or an alternation chain
>= 6).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--compare", default=None)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.agent_flow import tool_loop_audit
    from tits_spark.operators.transcript_stats import (
        conversation_stats,
        transcript_checksum,
        transcript_diff,
    )
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-transcript-audit",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    tr = spark.read.parquet(args.input)
    stats = conversation_stats(tr)
    sums = transcript_checksum(tr)
    out = stats.join(sums.select("conv_id", "digest"), "conv_id", "left")
    out.write.mode("overwrite").parquet(f"{args.output}/stats")
    tool_loop_audit(tr).write.mode("overwrite").parquet(
        f"{args.output}/loops"
    )

    changed = only_a = only_b = -1
    if args.compare:
        other = spark.read.parquet(args.compare)
        diff = transcript_diff(tr, other)
        diff.write.mode("overwrite").parquet(f"{args.output}/diff")
        counts = {
            r["status"]: r["n"]
            for r in diff.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        changed = counts.get("changed", 0)
        only_a = counts.get("only_a", 0)
        only_b = counts.get("only_b", 0)

    written = spark.read.parquet(f"{args.output}/stats")
    loops = spark.read.parquet(f"{args.output}/loops")
    worst = loops.agg(F.max("longest_run")).first()[0]
    print(json.dumps({
        "convs": written.count(),
        "turns": written.agg(F.sum("n_turns")).first()[0],
        "changed": changed,
        "only_a": only_a,
        "only_b": only_b,
        "loop_convs": loops.filter(
            (F.col("longest_run") >= 5) | (F.col("ab_chain_max") >= 6)
        ).count(),
        "worst_run": worst,
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
