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

from tits_spark.operators.rollup import (
    CALENDAR_UNITS,
    TIER_ORDER,
    rollup_calendar,
    rollup_cascade,
    rollup_from_raw,
)
from tits_spark.sources.table_io import METRICS_SCHEMA, resolve_table_io


class MetricsLog:
    """Append-only lineage/metrics table (storage via TableIO: parquet
    directory here; Iceberg table when a catalog + runtime exist)."""

    def __init__(self, spark: SparkSession, path: str, io=None):
        self.spark = spark
        self.path = path
        self.io = io or resolve_table_io(spark, path, path)

    def read(self) -> DataFrame:
        return self.io.read_metrics()

    def committed(self, stage: str) -> DataFrame:
        """Distinct committed partition keys for a stage."""
        return (
            self.read().filter(F.col("stage") == stage).select("part").distinct()
        )

    def append(self, rows: DataFrame) -> None:
        self.io.append_metrics(rows)


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


def incremental_rollup(
    spark: SparkSession,
    raw: DataFrame,
    tiers_path: str,
    metrics_path: str,
    key: str = "conv_id",
    ts: str = "ts",
    value: str = "value",
    job_id: str | None = None,
    files_per_day: int = 1,
    backfill: bool = False,
) -> dict[str, int]:
    """Run (or resume) the raw -> 1m -> 1h -> 1d cascade.

    Only day-partitions not yet in the metrics log are processed; each
    processed tier-partition gets a lineage row. Storage resolves via
    TableIO — parquet directories here, Iceberg tables when
    ``tiers_path`` is a dotted identifier and the runtime jar is on the
    classpath. Returns {stage: n_partitions_processed}.

    ``backfill=True`` additionally detects LATE DATA: committed days
    whose current raw row count no longer matches the lineage log's
    ``input_count`` (written as sum(n_obs), i.e. the raw rows the day
    had when committed) are re-processed through every tier. Correct
    for late ARRIVALS and deletions that change the count; an
    update-in-place that swaps one row for another (count unchanged)
    is invisible to this probe — pass the affected days explicitly by
    deleting their lineage rows if that ever matters. Costs one raw
    count aggregate; the rewrite itself is the same idempotent
    dynamic-partition overwrite as resume, and verify_lineage compares
    against the LATEST committed checksum (max_by committed_at), so
    backfilled partitions verify clean.
    """
    job_id = job_id or uuid.uuid4().hex[:12]
    io = resolve_table_io(spark, tiers_path, metrics_path)
    log = MetricsLog(spark, metrics_path, io=io)
    processed: dict[str, int] = {}

    committed_all = {
        (r["stage"], r["part"])
        for r in log.read().select("stage", "part").distinct().collect()
    }
    if not committed_all:
        # fresh run: nothing committed, everything pending — skip the
        # day-discovery scan of the input entirely
        present_days: list = []
    else:
        # one scan: the set of day-partitions present in the input
        present_days = sorted(
            r["day"]
            for r in raw.select(F.to_date(ts).alias("day")).distinct().collect()
        )

    changed_parts: set[str] = set()
    if backfill and committed_all:
        latest_counts = {
            r["part"]: r["n"]
            for r in log.read()
            .filter(F.col("stage") == "tier_1m")
            .groupBy("part")
            .agg(F.max_by("input_count", "committed_at").alias("n"))
            .collect()
        }
        current_counts = {
            r["day"].strftime("%Y-%m-%d"): r["n"]
            for r in raw.groupBy(F.to_date(ts).alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        changed_parts = {
            part for part, n in current_counts.items()
            if part in latest_counts and latest_counts[part] != n
        }

    fresh = not committed_all
    prev_tier: DataFrame | None = None
    for tier in TIER_ORDER:
        stage = f"tier_{tier}"
        pending_days = present_days if fresh else [
            d for d in present_days
            if (stage, d.strftime("%Y-%m-%d")) not in committed_all
            or d.strftime("%Y-%m-%d") in changed_parts
        ]
        if not fresh and not pending_days:
            processed[stage] = 0
            prev_tier = None  # nothing new; later tiers read from disk
            continue

        # fresh-run fast path: when every present day is pending, skip
        # the per-row day membership filter entirely (it costs a full
        # column evaluation over the raw scan for no selectivity)
        full = fresh or len(pending_days) == len(present_days)
        if tier == "1m":
            src = raw if full else raw.filter(F.to_date(ts).isin(pending_days))
            cur = rollup_from_raw(src, key, ts, value, tier)
        else:
            if prev_tier is None:
                finer = TIER_ORDER[TIER_ORDER.index(tier) - 1]
                prev_tier = io.read_tier(finer).drop("bucket_date")
            src = prev_tier if full else prev_tier.filter(
                F.to_date("bucket_ts").isin(pending_days)
            )
            cur = rollup_cascade(src, tier)
        io.write_tier(cur, tier, files_per_day=files_per_day)
        # read the tier back from storage (cheap columnar scan) instead of
        # caching the shuffle output: lineage checksums then attest what
        # is actually on disk, and the next tier's cascade scans parquet
        # instead of a memory-hungry cached plan (a measured 30%+ win)
        written = io.read_tier(tier).drop("bucket_date")
        lineage_src = written if full else written.filter(
            F.to_date("bucket_ts").isin(pending_days)
        )
        log.append(_lineage_rows(lineage_src, job_id, stage))
        if fresh:
            # day count from the written partition directories (no scan)
            processed[stage] = io.tier_partition_count(tier)
        else:
            processed[stage] = len(pending_days)
        # next tier must see the WHOLE finer tier (its own pending set may
        # be wider after a crash between tier commits), so keep unfiltered
        prev_tier = written
    return processed


def _cal_start(day: dt.date, unit: str) -> dt.date:
    """First day of the calendar bucket containing ``day`` (matches
    Spark/DuckDB date_trunc: weeks start Monday, UTC)."""
    if unit == "week":
        return day - dt.timedelta(days=day.weekday())
    if unit == "month":
        return day.replace(day=1)
    if unit == "quarter":
        return day.replace(month=(day.month - 1) // 3 * 3 + 1, day=1)
    if unit == "year":
        return day.replace(month=1, day=1)
    raise ValueError(f"unit must be one of {CALENDAR_UNITS}, got {unit!r}")


def incremental_calendar(
    spark: SparkSession,
    tiers_path: str,
    metrics_path: str,
    unit: str = "month",
    job_id: str | None = None,
) -> dict[str, int]:
    """Maintain a calendar tier (week/month/quarter/year) off the 1d
    tier under the same lineage/resume discipline.

    The partition unit here is the CALENDAR BUCKET (part = its first
    day), and pendingness is derived purely from the lineage log — no
    data scan: a bucket needs (re)processing iff it has no committed
    row yet, or any of its days' ``tier_1d`` rows committed AFTER the
    bucket's last commit (which is exactly what resume, late-data
    backfill, and ordinary new-day ingestion all look like from the
    log). Recomputation reads only the affected buckets' slice of the
    ~86400x-reduced day tier; the write is the same idempotent
    dynamic-partition overwrite, so a crash mid-run just re-runs.

    Returns {stage: n_buckets_processed}; stage name is
    ``tier_<unit>``.
    """
    stage = f"tier_{unit}"
    job_id = job_id or uuid.uuid4().hex[:12]
    io = resolve_table_io(spark, tiers_path, metrics_path)
    log = MetricsLog(spark, metrics_path, io=io)

    day_commits = {
        r["part"]: r["at"]
        for r in log.read()
        .filter(F.col("stage") == "tier_1d")
        .groupBy("part")
        .agg(F.max("committed_at").alias("at"))
        .collect()
    }
    cal_commits = {
        r["part"]: r["at"]
        for r in log.read()
        .filter(F.col("stage") == stage)
        .groupBy("part")
        .agg(F.max("committed_at").alias("at"))
        .collect()
    }
    pending: set[dt.date] = set()
    for day_str, at in day_commits.items():
        start = _cal_start(dt.date.fromisoformat(day_str), unit)
        prev = cal_commits.get(start.isoformat())
        if prev is None or at > prev:
            pending.add(start)
    if not pending:
        return {stage: 0}

    day_tier = io.read_tier("1d").drop("bucket_date")
    full = len(pending) >= len(
        {_cal_start(dt.date.fromisoformat(d), unit) for d in day_commits}
    )
    src = day_tier if full else day_tier.filter(
        F.date_trunc(unit, "bucket_ts").cast("date").isin(sorted(pending))
    )
    io.write_tier(rollup_calendar(src, unit), unit)
    written = io.read_tier(unit).drop("bucket_date")
    rows = written if full else written.filter(
        F.to_date("bucket_ts").isin(sorted(pending))
    )
    log.append(_lineage_rows(rows, job_id, stage))
    return {stage: len(pending)}


def verify_lineage(spark: SparkSession, tiers_path: str, metrics_path: str) -> DataFrame:
    """Recompute per-partition checksums from the stored tiers and join
    against the logged ones — rows with match=false indicate corruption
    or non-deterministic recomputation."""
    io = resolve_table_io(spark, tiers_path, metrics_path)
    log = MetricsLog(spark, metrics_path, io=io)
    latest = (
        log.read()
        .groupBy("stage", "part")
        .agg(F.max_by("checksum", "committed_at").alias("checksum"))
    )
    out = None
    checks = [(f"tier_{t}", t, _CHECKSUM_EXPR) for t in TIER_ORDER]
    # calendar tiers store their bucket's first day as the part, so the
    # generic yyyy-MM-dd grouping below verifies them unchanged
    checks += [(f"tier_{u}", u, _CHECKSUM_EXPR) for u in CALENDAR_UNITS]
    # sketch tiers (if the job ran with them) verify with their own
    # checksum expressions; SKETCH_STAGES is defined below
    checks += [
        (stage, stage, expr) for stage, (expr, _) in SKETCH_STAGES.items()
    ]
    for stage_name, tier_name, expr in checks:
        try:
            t = io.read_tier(tier_name)
        except Exception:  # noqa: BLE001
            continue
        cur = (
            t.withColumn("part", F.date_format(F.to_date("bucket_ts"), "yyyy-MM-dd"))
            .groupBy("part")
            .agg(F.expr(expr).alias("actual"))
            .withColumn("stage", F.lit(stage_name))
        )
        out = cur if out is None else out.unionByName(cur)
    if out is None:
        return spark.createDataFrame([], "stage string, part string, match boolean")
    return (
        out.join(latest, ["stage", "part"], "left")
        .select("stage", "part", (F.col("actual") == F.col("checksum")).alias("match"))
    )


def snapshots(spark: SparkSession, metrics_path: str, io=None) -> DataFrame:
    """Commit history, one row per (job_id, stage): commit time span,
    partitions and buckets committed. The lineage log IS the commit
    protocol (a partition is visible iff its row exists), so this is
    the engine's snapshot listing — the parquet-backend analog of
    Iceberg's snapshots metadata table (on the Iceberg backend every
    append is a real table snapshot and `.snapshots` is native)."""
    log = MetricsLog(spark, metrics_path, io=io)
    return (
        log.read()
        .groupBy("job_id", "stage")
        .agg(
            F.min("committed_at").alias("committed_from"),
            F.max("committed_at").alias("committed_to"),
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("bucket_count").alias("n_buckets"),
        )
        .orderBy("committed_from")
    )


def read_tier_as_of(
    spark: SparkSession,
    tiers_path: str,
    metrics_path: str,
    tier: str,
    as_of=None,
    job_id: str | None = None,
) -> DataFrame:
    """Commit-log time travel over a tier: rows of the day partitions
    whose FIRST lineage commit is at or before ``as_of`` (a timestamp
    or ISO string), or that were committed by jobs up to and including
    ``job_id``'s completion.

    Parquet-backend caveat (documented, inherent to the layout):
    dynamic partition overwrite replaces files in place, so a
    partition RE-written by a later backfill shows its CURRENT
    content — this is visibility travel (which partitions existed),
    not full snapshot isolation. On the Iceberg backend use
    ``IcebergTableIO.read_tier_as_of``, which delegates to native
    snapshot time travel and has no such caveat.

    The committed-parts frame is tiny (one row per day) and broadcast,
    so Spark's dynamic partition pruning keeps the scan to exactly the
    visible ``bucket_date=`` directories.
    """
    io = resolve_table_io(spark, tiers_path, metrics_path)
    log = MetricsLog(spark, metrics_path, io=io)
    m = log.read().filter(F.col("stage") == f"tier_{tier}")
    if job_id is not None:
        upto = (
            m.filter(F.col("job_id") == job_id)
            .agg(F.max("committed_at").alias("t"))
            .first()
            .t
        )
        if upto is None:
            raise ValueError(f"read_tier_as_of: job_id {job_id!r} has no commits")
        as_of = upto
    if as_of is None:
        raise ValueError("read_tier_as_of: pass as_of or job_id")
    parts = (
        m.groupBy("part")
        .agg(F.min("committed_at").alias("first_commit"))
        .filter(F.col("first_commit") <= F.lit(as_of).cast("timestamp"))
        .select(F.col("part").alias("bucket_date"))
    )
    t = io.read_tier(tier)
    return t.join(F.broadcast(parts), "bucket_date", "left_semi")


# ---------------------------------------------------- sketch tiers

#: checksum expressions per sketch stage (order-independent xor, same
#: discipline as the rollup tiers' _CHECKSUM_EXPR)
SKETCH_STAGES = {
    "hll_1m": ("bit_xor(xxhash64(bucket_ts, reg, rho))", "count(1)"),
    "hist_1m": ("bit_xor(xxhash64(bucket_ts, q, cnt))", "sum(cnt)"),
}


def _sketch_lineage_rows(
    df: DataFrame, job_id: str, stage: str, checksum_expr: str,
    input_count_expr: str,
) -> DataFrame:
    return (
        df.withColumn("part", F.date_format(F.to_date("bucket_ts"), "yyyy-MM-dd"))
        .groupBy("part")
        .agg(
            F.expr(input_count_expr).cast("long").alias("input_count"),
            F.count(F.lit(1)).alias("bucket_count"),
            F.expr(checksum_expr).alias("checksum"),
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


def incremental_sketches(
    spark: SparkSession,
    raw: DataFrame,
    tiers_path: str,
    metrics_path: str,
    ts: str = "ts",
    item: str = "conv_id",
    value: str = "value",
    job_id: str | None = None,
    p: int = 8,
    scale: int = 100,
    files_per_day: int = 1,
) -> dict[str, int]:
    """Run (or resume) the sketch column families alongside the rollup
    cascade: per-1m-bucket HLL registers of ``item`` (distinct counts)
    and per-1m-bucket value histograms (quantiles). Both are mergeable,
    so ONLY the finest tier is stored — coarser tiers derive at read
    time via registers_cascade / hist_cascade at register/histogram
    cost, never touching raw.

    Same exactness argument as incremental_rollup: buckets nest in
    days, so day-scoped resume is exact; writes are idempotent dynamic
    partition overwrites and a partition is visible iff its lineage row
    committed. Returns {stage: n_partitions_processed}.
    """
    from tits_spark.operators.quantiles import value_histogram
    from tits_spark.operators.rollup_sketch import distinct_registers

    job_id = job_id or uuid.uuid4().hex[:12]
    io = resolve_table_io(spark, tiers_path, metrics_path)
    log = MetricsLog(spark, metrics_path, io=io)
    processed: dict[str, int] = {}

    committed_all = {
        (r["stage"], r["part"])
        for r in log.read().select("stage", "part").distinct().collect()
        if r["stage"] in SKETCH_STAGES
    }
    present_days = sorted(
        r["day"]
        for r in raw.select(F.to_date(ts).alias("day")).distinct().collect()
    )

    def build(stage: str, src: DataFrame) -> DataFrame:
        if stage == "hll_1m":
            return distinct_registers(
                src.select(ts, F.col(item).cast("string").alias("_it")),
                ts, "_it", "1m", p,
            )
        return value_histogram(
            src.select(F.date_trunc("minute", ts).alias("bucket_ts"), value),
            ["bucket_ts"], value, scale,
        )

    for stage, (checksum_expr, input_expr) in SKETCH_STAGES.items():
        pending = [
            d for d in present_days
            if (stage, d.strftime("%Y-%m-%d")) not in committed_all
        ]
        if not pending:
            processed[stage] = 0
            continue
        full = len(pending) == len(present_days)
        src = raw if full else raw.filter(F.to_date(ts).isin(pending))
        io.write_tier(build(stage, src), stage, files_per_day=files_per_day)
        written = io.read_tier(stage).drop("bucket_date")
        src_rows = written if full else written.filter(
            F.to_date("bucket_ts").isin(pending)
        )
        log.append(
            _sketch_lineage_rows(src_rows, job_id, stage, checksum_expr, input_expr)
        )
        processed[stage] = len(pending)
    return processed
