"""Retention TTLs per tier (north_rule: cascading retention tiers).

Each tier keeps a sliding horizon of day-partitions: raw/1m keep the
least history, 1d the most (the classic downsample-and-expire layout,
the scale-out version of the reference's ring-buffer retention,
ref:guess_lag.c:90-99). Expiry is a partition-directory delete — O(1)
metadata work per day, no row rewrites — plus a tombstone row in the
metrics log so lineage records what was expired and resume never
re-processes an expired day.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tits_spark.lineage import MetricsLog

#: default horizon (days of history) per tier
DEFAULT_TTL_DAYS = {"1m": 30, "1h": 365, "1d": 3650}


def expire_partitions(
    spark: SparkSession,
    tiers_path: str,
    metrics_path: str,
    as_of: dt.date,
    ttl_days: dict[str, int] | None = None,
    job_id: str = "retention",
) -> dict[str, list[str]]:
    """Delete tier day-partitions older than their TTL horizon.

    Returns {tier: [expired bucket_date strings]}. Idempotent: already
    deleted partitions simply don't exist.
    """
    ttl_days = ttl_days or DEFAULT_TTL_DAYS
    log = MetricsLog(spark, metrics_path)
    expired: dict[str, list[str]] = {}
    rows = []
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    for tier, ttl in ttl_days.items():
        cutoff = as_of - dt.timedelta(days=ttl)
        tier_dir = Path(tiers_path) / f"tier={tier}"
        gone = []
        if tier_dir.exists():
            for p in sorted(tier_dir.glob("bucket_date=*")):
                day = p.name.split("=", 1)[1]
                if dt.date.fromisoformat(day) < cutoff:
                    shutil.rmtree(p)
                    gone.append(day)
                    rows.append(
                        (job_id, f"expired_{tier}", day, 0, 0, 0, now)
                    )
        expired[tier] = gone
    if rows:
        log.append(
            spark.createDataFrame(
                rows,
                "job_id string, stage string, part string, input_count long, "
                "bucket_count long, checksum long, committed_at timestamp",
            )
        )
    return expired


def compact_partitions(
    spark: SparkSession,
    tiers_path: str,
    metrics_path: str,
    tier: str,
    max_files_per_day: int = 4,
    target_file_mb: int = 256,
    job_id: str = "compaction",
) -> dict[str, int]:
    """Rewrite small-file day partitions into ~target_file_mb files.

    The parquet-dir stand-in for Iceberg's ``rewrite_data_files``: at
    10^12-turn scale every late-arriving resume or fine-grained
    incremental run leaves slivers that tax the scan planner; compaction
    bin-packs each offending day into ceil(bytes/target) files.

    Content safety is proven, not assumed: the partition's
    order-independent lineage checksum (bit_xor of xxhash64 over the
    canonical columns) is recomputed from the compacted copy and must
    equal the pre-compaction value BEFORE the swap — a mismatch aborts
    that day and leaves the original in place. Swap is staged
    (write tmp -> verify -> trash old -> move in): any crash window
    leaves either the original or the verified copy on disk, and the
    metrics log records what was compacted.

    Returns {bucket_date: n_files_after} for the days rewritten.
    """
    from tits_spark.lineage import _CHECKSUM_EXPR

    log = MetricsLog(spark, metrics_path)
    tier_dir = Path(tiers_path) / f"tier={tier}"
    done: dict[str, int] = {}
    rows = []
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    if not tier_dir.exists():
        return done
    for p in sorted(tier_dir.glob("bucket_date=*")):
        files = [f for f in p.glob("*.parquet")]
        if len(files) <= max_files_per_day:
            continue
        day = p.name.split("=", 1)[1]
        nbytes = sum(f.stat().st_size for f in files)
        n_out = max(1, -(-nbytes // (target_file_mb * 1024 * 1024)))

        before = spark.read.parquet(str(p))
        chk_before = before.select(F.expr(_CHECKSUM_EXPR).alias("c")).collect()[0]["c"]
        n_rows = before.count()

        tmp = tier_dir / f".compact_tmp_{day}"
        shutil.rmtree(tmp, ignore_errors=True)
        before.repartition(int(n_out)).write.mode("overwrite").parquet(str(tmp))

        after = spark.read.parquet(str(tmp))
        chk_after = after.select(F.expr(_CHECKSUM_EXPR).alias("c")).collect()[0]["c"]
        if chk_after != chk_before or after.count() != n_rows:
            shutil.rmtree(tmp, ignore_errors=True)  # abort: original untouched
            continue

        trash = tier_dir / f".compact_trash_{day}"
        shutil.rmtree(trash, ignore_errors=True)
        p.rename(trash)
        tmp.rename(p)
        shutil.rmtree(trash)
        done[day] = int(n_out)
        rows.append((job_id, f"compacted_{tier}", day, n_rows,
                     int(n_out), chk_before, now))
    if rows:
        log.append(
            spark.createDataFrame(
                rows,
                "job_id string, stage string, part string, input_count long, "
                "bucket_count long, checksum long, committed_at timestamp",
            )
        )
    return done
