"""spark-submit entry point for the production rollup pipeline.

    spark-submit --py-files tits_spark.zip jobs/rollup_job.py \
        --input  /data/transcripts \
        --tiers  /data/tiers \
        --metrics /data/metrics \
        --key conv_id --ts ts --value-expr "length(text)" \
        [--files-per-day 8]

Runs (or resumes) the raw -> 1m -> 1h -> 1d cascade with per-partition
lineage; on a cluster the master/executor topology comes from
spark-submit, locally pass --cores for local[N].
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--tiers", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--key", default="conv_id")
    ap.add_argument("--ts", default="ts")
    ap.add_argument("--value-expr", default="length(text)",
                    help="SQL expression for the rollup value column")
    ap.add_argument("--cores", default="inherit",
                    help="'inherit' (default) uses spark-submit's --master; "
                         "pass N to force local[N]")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--backfill", action="store_true",
                    help="re-process committed days whose raw row count "
                         "changed since commit (late data); one extra "
                         "count aggregate over the input")
    ap.add_argument("--calendar", default=None,
                    choices=["week", "month", "quarter", "year"],
                    help="also maintain a calendar tier cascaded off "
                         "the 1d tier, with log-driven recompute of "
                         "buckets whose days changed (same lineage/"
                         "resume discipline)")
    ap.add_argument("--sketches", action="store_true",
                    help="also maintain the mergeable sketch tiers "
                         "(per-1m HLL registers of the key for distinct "
                         "counts + value histograms for quantiles), with "
                         "the same lineage/resume discipline")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.lineage import (
        incremental_calendar,
        incremental_rollup,
        incremental_sketches,
    )
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-rollup",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    raw = spark.read.parquet(args.input).select(
        F.col(args.key).alias("conv_id"),
        F.col(args.ts).alias("ts"),
        F.expr(args.value_expr).cast("double").alias("value"),
    )
    n = raw.count()
    t0 = time.perf_counter()
    processed = incremental_rollup(
        spark, raw, args.tiers, args.metrics,
        key="conv_id", ts="ts", value="value", job_id=args.job_id,
        backfill=args.backfill,
    )
    if args.sketches:
        processed.update(incremental_sketches(
            spark, raw, args.tiers, args.metrics,
            ts="ts", item="conv_id", value="value", job_id=args.job_id,
        ))
    if args.calendar:
        processed.update(incremental_calendar(
            spark, args.tiers, args.metrics,
            unit=args.calendar, job_id=args.job_id,
        ))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "rows": n,
        "sec": round(dt, 3),
        "rows_per_sec": round(n / dt, 1),
        "partitions_processed": processed,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
