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
