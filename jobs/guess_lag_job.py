"""spark-submit entry point for the guess_lag lead/lag estimator.

The reference ships guess_lag as an executable that reads tick TSV
lines from stdin and prints (tab-separated) the full correlogram or,
with --best, only the best lag per pair (ref:guess_lag.c:336-357,
guess_lag.yuck:1-5). This is the same contract as a batch job:

    spark-submit --py-files tits_spark.zip jobs/guess_lag_job.py \\
        --input  /data/ticks.tsv            # `sec.nsec\\tECN\\tbid\\task`
        --output /data/best_lags            # TSV dataset out
        [--full]                            # correlogram, not just best
        [--input-format tick-tsv|parquet]   # parquet = (ts,venue,bid,ask)
        [--nlags 256] [--tau 0.01] [--max-ticks 4096]

Prints ONE JSON line: {"ticks": N, "rows": M, "sec": S}.
Malformed tick lines are dropped silently, exactly like the reference
parser (ref:guess_lag.c:107-226).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-format", choices=["tick-tsv", "parquet"],
                    default="tick-tsv")
    ap.add_argument("--full", action="store_true",
                    help="emit the full correlogram instead of --best rows")
    ap.add_argument("--nlags", type=int, default=256)
    ap.add_argument("--tau", type=float, default=0.01)
    ap.add_argument("--max-ticks", type=int, default=4096)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.guess_lag import guess_lag
    from tits_spark.session import get_spark
    from tits_spark.sources.tick_source import read_tick_file, write_correlogram_tsv

    spark = get_spark(
        "tits_spark-guess-lag",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.input_format == "tick-tsv":
        quotes = read_tick_file(spark, args.input).select(
            "ts", "venue",
            F.col("bid").cast("double").alias("bid"),
            F.col("ask").cast("double").alias("ask"),
        )
    else:
        quotes = spark.read.parquet(args.input).select("ts", "venue", "bid", "ask")
    quotes = quotes.cache()
    n_ticks = quotes.count()

    t0 = time.perf_counter()
    out = guess_lag(
        quotes,
        best=not args.full,
        max_ticks=args.max_ticks,
        nlags=args.nlags,
        tau=args.tau,
    ).cache()
    rows = out.count()
    write_correlogram_tsv(out, args.output)
    print(json.dumps({
        "ticks": n_ticks,
        "rows": rows,
        "sec": round(time.perf_counter() - t0, 3),
    }))


if __name__ == "__main__":
    main()
