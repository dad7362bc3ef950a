"""spark-submit entry point for tier maintenance: retention expiry +
small-file compaction (north_rule: cascading retention tiers).

    spark-submit --py-files tits_spark.zip jobs/retention_job.py \
        --tiers /data/tiers --metrics /data/metrics \
        [--as-of 2026-08-16] [--ttl 1m=30 --ttl 1h=365 --ttl 1d=3650] \
        [--compact] [--max-files-per-day 4] [--target-file-mb 256]

Expiry deletes whole day-partition directories past each tier's TTL
horizon (O(1) metadata per day, tombstoned in the metrics log so resume
never re-processes an expired day). Compaction bin-packs sliver-file
days and proves content preservation via the lineage checksum before
swapping. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--as-of", default=None, help="YYYY-MM-DD; default today UTC")
    ap.add_argument("--ttl", action="append", default=[],
                    help="tier=days, repeatable (default 1m=30 1h=365 1d=3650)")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--max-files-per-day", type=int, default=4)
    ap.add_argument("--target-file-mb", type=int, default=256)
    ap.add_argument("--cores", default="inherit")
    args = ap.parse_args(argv)

    from tits_spark.operators.retention import (
        DEFAULT_TTL_DAYS,
        compact_partitions,
        expire_partitions,
    )
    from tits_spark.session import get_spark

    spark = get_spark("tits_spark-retention", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    as_of = (
        dt.date.fromisoformat(args.as_of)
        if args.as_of
        else dt.datetime.now(dt.timezone.utc).date()
    )
    ttl = dict(DEFAULT_TTL_DAYS)
    for spec in args.ttl:
        tier, days = spec.split("=", 1)
        ttl[tier] = int(days)

    t0 = time.perf_counter()
    expired = expire_partitions(
        spark, args.tiers, args.metrics, as_of=as_of, ttl_days=ttl
    )
    compacted: dict[str, dict[str, int]] = {}
    if args.compact:
        for tier in ttl:
            compacted[tier] = compact_partitions(
                spark, args.tiers, args.metrics, tier,
                max_files_per_day=args.max_files_per_day,
                target_file_mb=args.target_file_mb,
            )
    print(json.dumps({
        "as_of": str(as_of),
        "expired": {t: len(v) for t, v in expired.items()},
        "compacted": {t: len(v) for t, v in compacted.items()},
        "sec": round(time.perf_counter() - t0, 3),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
