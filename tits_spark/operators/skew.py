"""Skew-aware partitioning helpers (north_rule: salted repartitioning on
hash(conv_id) + adaptive coalesce of small series).

Where skew shows up in this engine and what bounds it:

 - rollup tiers group on (key, bucket_ts): a Pareto-sized giant
   conversation spreads over its many buckets, so per-group width is
   already bounded; the residual skew is per-PARTITION row imbalance,
   handled by salted repartitioning before heavy per-key stages;
 - per-key applyInPandas kernels put a whole series in one task; the
   bound is the sliding-window crop (MAX_TICKS) or the generator's
   turn cap — state, not shuffle, is the limit;
 - joins: AQE skew-join splitting is enabled session-wide
   (tits_spark.session), and the two-phase aggregation below is the
   explicit fallback for pathological single-key aggregations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Spread each key's rows over ``salt_buckets`` partitions:
    partition on (xxhash64(key) % P, salt) where the salt derives from a
    per-row column (default: every column via xxhash64(*)) so the split
    is deterministic, not rand()."""
    salt_col = (
        F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    return df.repartition(
        num_partitions, F.pmod(F.xxhash64(key), F.lit(num_partitions)), salt_col
    )


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial agg on
    (key, salt) shrinks the giant key's rows to ``salt_buckets``
    partials before the final shuffle on key alone.

    ``aggs``: list of (column, fn) with fn in {count, sum, min, max}
    (the associative set). Catalyst's partial aggregation does this
    implicitly for hash aggregates; the explicit form exists for when a
    first-stage *shuffle* on the bare key would itself be skewed (e.g.
    feeding a window or applyInPandas, which have no partial phase)."""
    salt = (
        F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    fn_map = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    partial_exprs = [fn_map[fn](F.col(c)).alias(f"_{fn}_{c}") for c, fn in aggs]
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial_exprs)

    refn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    final_exprs = [
        refn[fn](F.col(f"_{fn}_{c}")).alias(f"{fn}_{c}") for c, fn in aggs
    ]
    return partial.groupBy(key).agg(*final_exprs)


def key_size_stats(df: DataFrame, key: str) -> DataFrame:
    """Per-key row counts with skew diagnostics columns (share of total,
    rank) — the observability hook for choosing salt_buckets."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    # bounded-global-window: diagnostics over the per-key counts frame
    # (|keys| rows post-aggregation); rank below shares the bound
    total = Window.partitionBy()
    return counts.select(
        key,
        "n_rows",
        (F.col("n_rows") / F.sum("n_rows").over(total)).alias("share"),
        # bounded-global-window: same |keys|-row frame as above
        F.row_number().over(Window.orderBy(F.desc("n_rows"))).alias("rank"),
    )


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Guarantee at least defaultParallelism input partitions before a
    CPU-amplifying stage (shingle explode -> hash, n-gram generation):
    byte-based file splitting provisions map tasks for the INPUT size,
    but an explode amplifies per-row work ~two orders of magnitude, so
    a corpus that fits one 128 MB split would hash on a single core.

    No-op (zero cost, no shuffle) whenever the scan already yields
    enough splits — i.e. always at production scale, where thousands of
    file splits exceed cluster parallelism. The repartition only ever
    fires on inputs so small they undershoot the core count, where
    shuffling the compact (id, text) rows costs milliseconds and buys
    full map-side parallelism for the expensive stage above it.

    The probe is metadata-only: ``df.rdd.getNumPartitions()`` would
    resolve the AdaptiveSparkPlan, EXECUTING any upstream shuffle
    stages at plan-construction time (and again at the real action).
    Instead, scan-rooted frames are sized by their file list (a
    listing, no job); derived frames — which already carry shuffle
    partitions >= cluster parallelism from whatever produced them —
    pass through untouched.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 - e.g. streaming frames
        return df
    if not files:
        # A CACHED frame also lands here: InMemoryRelation hides the
        # file scan from inputFiles(), but KEEPS the scan's partitioning
        # — for a small single-file corpus that is ONE cached partition,
        # and the explode/hash stage above this guard then runs on one
        # core (measured 2.7s vs 0.3s on the bench corpus). When the
        # cache is already materialized, its partition count is pure
        # metadata (no job), so probe it and repair narrow caches:
        try:
            jplan = df._jdf.queryExecution().optimizedPlan()
            if jplan.nodeName() == "InMemoryRelation":
                cb = jplan.cacheBuilder()
                if cb.isCachedColumnBuffersLoaded():
                    nparts = cb.cachedColumnBuffers().getNumPartitions()
                    if nparts < target:
                        return df.repartition(target)
        except Exception:  # noqa: BLE001 - py4j surface drift: fall through
            pass
        # Derived (shuffle-rooted), non-file, or not-yet-materialized
        # cached frame: its partitioning already reflects
        # spark.sql.shuffle.partitions. CAVEAT for
        # callers: this pass-through trusts the producer — a frame that
        # was coalesce(1)'d, or whose last exchange AQE already
        # advisory-coalesced, arrives under-partitioned and is NOT
        # repaired here (probing real partition metadata would resolve
        # the AdaptiveSparkPlan and execute upstream stages, see above).
        # If the stage you are protecting is a CPU-bound grouped/
        # cogrouped Arrow UDF, do not rely on this helper: apply the
        # numbered-repartition guard directly at the call site
        # (BENCH/PLANS.md; matrix_profile.py / guess_lag.py show the
        # pattern). Current callers (dedup/text/vocab/decontam/
        # substring_dedup) all feed scan-rooted corpus frames, where
        # the file-list probe above is authoritative.
        return df
    if len(files) < target:
        return df.repartition(target)
    return df
