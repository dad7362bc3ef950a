"""Per-partition lineage + checkpoint resume (north_rule).

Every rollup stage appends per-partition rows
    (job_id, stage, part, input_count, bucket_count, checksum, committed_at)
to a metrics table; a resumed job anti-joins pending partitions against
the committed set and re-processes only the gap. Writes are idempotent:
tier data is written with dynamic partition overwrite, so re-running a
partition replaces it bit-for-bit instead of duplicating.

Partition unit = calendar day. All three tiers (1m/1h/1d) nest inside a
day, so day-scoped incremental processing is *exact* — no bucket ever
spans two lineage partitions. (This is why the tier cascade stays
associative under resume.)

The checksum is an order-independent ``bit_xor(xxhash64(...))`` over the
tier rows of the partition — comparable across recomputations regardless
of task scheduling, mirroring the reference's use of the xxHash family
for keying (ref:hash.c:325-344; we use Spark's built-in xxhash64).

Without an Iceberg runtime jar, the metrics table doubles as the commit
log over a plain parquet directory layout (SURVEY.md §7): a partition is
visible iff a lineage row exists for it, giving exactly-once semantics
on top of idempotent partition overwrites.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tits_spark.operators.rollup import TIER_ORDER, rollup_cascade, rollup_from_raw

METRICS_SCHEMA = (
    "job_id string, stage string, part string, input_count long, "
    "bucket_count long, checksum long, committed_at timestamp"
)


class MetricsLog:
    """Append-only lineage/metrics table over a parquet directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)
        except Exception:  # noqa: BLE001 — missing dir on first run
            return self.spark.createDataFrame([], METRICS_SCHEMA)

    def committed(self, stage: str) -> DataFrame:
        """Distinct committed partition keys for a stage."""
        return (
            self.read().filter(F.col("stage") == stage).select("part").distinct()
        )

    def append(self, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self.path)


# canonical column order hashed into the partition checksum — must be
# identical at write time and at verify time
CHECKSUM_COLS = [
    "key", "bucket_ts", "n_obs", "v_sum", "v_sumsq", "v_min", "v_max",
    "v_first", "v_last", "first_ts", "last_ts",
]
_CHECKSUM_EXPR = "bit_xor(xxhash64(" + ", ".join(CHECKSUM_COLS) + "))"


def _lineage_rows(tier_df: DataFrame, job_id: str, stage: str) -> DataFrame:
    return (
        tier_df.withColumn("part", F.date_format(F.to_date("bucket_ts"), "yyyy-MM-dd"))
        .groupBy("part")
        .agg(
            F.sum("n_obs").alias("input_count"),
            F.count(F.lit(1)).alias("bucket_count"),
            F.expr(_CHECKSUM_EXPR).alias("checksum"),
        )
        .select(
            F.lit(job_id).alias("job_id"),
            F.lit(stage).alias("stage"),
            "part",
            "input_count",
            "bucket_count",
            "checksum",
            F.lit(dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)).alias("committed_at"),
        )
    )


def _write_tier_partitions(tier_df: DataFrame, path: str, tier: str) -> None:
    """Idempotent per-day write: dynamic partition overwrite replaces
    exactly the days present in tier_df."""
    (
        tier_df.withColumn("bucket_date", F.to_date("bucket_ts"))
        .repartition("bucket_date")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(f"{path}/tier={tier}")
    )


def incremental_rollup(
    spark: SparkSession,
    raw: DataFrame,
    tiers_path: str,
    metrics_path: str,
    key: str = "conv_id",
    ts: str = "ts",
    value: str = "value",
    job_id: str | None = None,
) -> dict[str, int]:
    """Run (or resume) the raw -> 1m -> 1h -> 1d cascade.

    Only day-partitions not yet in the metrics log are processed; each
    processed tier-partition gets a lineage row. Returns
    {stage: n_partitions_processed}.
    """
    job_id = job_id or uuid.uuid4().hex[:12]
    log = MetricsLog(spark, metrics_path)
    processed: dict[str, int] = {}

    day = F.to_date(ts).alias("day")
    present = raw.select(day).distinct()

    prev_tier: DataFrame | None = None
    prev_pending: DataFrame | None = None
    for tier in TIER_ORDER:
        stage = f"tier_{tier}"
        committed = log.committed(stage).withColumnRenamed("part", "day_s")
        pending = (
            present.withColumn("day_s", F.date_format("day", "yyyy-MM-dd"))
            .join(committed, "day_s", "left_anti")
            .select("day")
        )
        pending_days = [r["day"] for r in pending.collect()]
        processed[stage] = len(pending_days)
        if not pending_days:
            prev_tier = None  # nothing new; later tiers read from disk
            continue

        if tier == "1m":
            src = raw.filter(F.to_date(ts).isin(pending_days))
            cur = rollup_from_raw(src, key, ts, value, tier)
        else:
            if prev_tier is None:
                finer = TIER_ORDER[TIER_ORDER.index(tier) - 1]
                prev_tier = spark.read.parquet(f"{tiers_path}/tier={finer}")
            cur = rollup_cascade(
                prev_tier.filter(F.to_date("bucket_ts").isin(pending_days)), tier
            )
        cur = cur.cache()
        _write_tier_partitions(cur, tiers_path, tier)
        log.append(_lineage_rows(cur, job_id, stage))
        prev_tier = cur
    return processed


def verify_lineage(spark: SparkSession, tiers_path: str, metrics_path: str) -> DataFrame:
    """Recompute per-partition checksums from the stored tiers and join
    against the logged ones — rows with match=false indicate corruption
    or non-deterministic recomputation."""
    log = MetricsLog(spark, metrics_path)
    latest = (
        log.read()
        .groupBy("stage", "part")
        .agg(F.max_by("checksum", "committed_at").alias("checksum"))
    )
    out = None
    for tier in TIER_ORDER:
        try:
            t = spark.read.parquet(f"{tiers_path}/tier={tier}")
        except Exception:  # noqa: BLE001
            continue
        cur = (
            t.withColumn("part", F.date_format(F.to_date("bucket_ts"), "yyyy-MM-dd"))
            .groupBy("part")
            .agg(F.expr(_CHECKSUM_EXPR).alias("actual"))
            .withColumn("stage", F.lit(f"tier_{tier}"))
        )
        out = cur if out is None else out.unionByName(cur)
    if out is None:
        return spark.createDataFrame([], "stage string, part string, match boolean")
    return (
        out.join(latest, ["stage", "part"], "left")
        .select("stage", "part", (F.col("actual") == F.col("checksum")).alias("match"))
    )
