"""Event-stream analytics: cohort retention and ordered funnels.

The two classic product-analytics queries over irregular event streams
(Amplitude/Mixpanel-class), here as first-class operators over the
engine's (user, ts, event_type) tables — the same irregular-series
data model the rollup/gap-fill family operates on.

Both are pure DataFrame algebra with oracle-able semantics:

 - :func:`cohort_retention` — users are cohorted by the bucket of
   their first-ever event; for every (cohort, age) cell the output
   counts distinct users active ``age`` buckets after their cohort
   bucket, plus the cohort size and the retention ratio.
 - :func:`funnel` — per user, the earliest strictly-ordered
   progression through the step list (each step's timestamp must be
   strictly after the previous step's); the standard "view ->
   click -> purchase" conversion query.

Scale notes (100 TB):
 - cohort_retention: one per-user aggregation (min ts), one equi-join
   back (both keyed by the high-cardinality user id), one
   (user, bucket) dedup, one final (cohort, age) aggregation — every
   shuffle is on user id or on the small (cohort, age) grid; no
   windows, no skew-prone low-cardinality keys.
 - funnel: k chained (filter -> per-user min -> equi-join) stages for
   a k-step funnel. Each stage's input is pre-filtered to ONE event
   type before its shuffle, so the shuffled volume is the step's own
   event count, not the stream; all joins are user-keyed equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def cohort_retention(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    bucket_secs: int = 86400,
) -> DataFrame:
    """Cohort x age retention grid.

    Returns ``(cohort_ts, age, n_active, cohort_size, retention)``:
    users whose first event fell in ``cohort_ts``'s bucket and who were
    active in the bucket ``age`` steps later (age 0 = the cohort bucket
    itself, so ``n_active == cohort_size`` and retention = 1.0 there).
    """
    from tits_spark.functions.exprs import epoch_us, floordiv

    bu = bucket_secs * _US
    ev = df.select(
        F.col(key_col).alias("k"), epoch_us(ts_col).alias("us")
    ).select("k", floordiv(F.col("us"), bu).alias("b"))
    first = ev.groupBy("k").agg(F.min("b").alias("cb"))
    active = ev.distinct()
    cells = (
        active.join(first, "k")
        .groupBy("cb", (F.col("b") - F.col("cb")).alias("age"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("cb").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(sizes, "cb")
        .select(
            F.timestamp_seconds(F.col("cb") * bucket_secs).alias("cohort_ts"),
            F.col("age").cast("long").alias("age"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Earliest strictly-ordered funnel progression per user.

    Returns one row per user who performed step 1, with columns
    ``t1..tk`` (timestamp of the earliest valid occurrence of each
    step, NULL once the chain breaks) and ``steps_completed``.

    "Earliest valid" is the standard greedy semantics: t1 = first
    step-1 event; t_i = first step-i event strictly after t_{i-1}.
    Greedy is optimal here: taking the earliest possible t_{i-1} never
    excludes a later completion (any valid chain's t_i is also valid
    for the greedy prefix).
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ev = df.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("ts"), F.col(type_col).alias("e")
    )
    cur = (
        ev.filter(F.col("e") == steps[0])
        .groupBy("k")
        .agg(F.min("ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("e") == step)
            .join(cur.select("k", F.col(f"t{i-1}").alias("_prev")), "k")
            .filter(F.col("ts") > F.col("_prev"))
            .groupBy("k")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "k", "left")
    completed = sum(
        (F.col(f"t{i}").isNotNull().cast("int") for i in range(1, len(steps) + 1)),
        start=F.lit(0),
    )
    return cur.select(
        F.col("k").alias(key_col),
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        completed.cast("int").alias("steps_completed"),
    )


def funnel_summary(
    df: DataFrame,
    steps: list[str],
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step reach counts: (step_idx, step, n_users, conversion)
    where conversion is vs step 1."""
    per_user = funnel(df, steps, key_col, ts_col, type_col)
    reach = per_user.agg(
        *[
            F.sum(F.col(f"t{i}").isNotNull().cast("long")).alias(f"r{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"r{i}").cast("long").alias("n_users"),
                (F.col(f"r{i}") / F.col("r1")).alias("conversion"),
            )
        )
    return reach.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def time_to_event(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "view",
    to_type: str = "purchase",
    order_tiebreak: str | None = None,
    horizon_sec: int | None = None,
) -> DataFrame:
    """Per source event: latency to the key's NEXT target event.

    The "time to conversion" primitive: for every ``from_type`` event,
    the microseconds until the same key's next ``to_type`` event
    (strictly after it in the sort order). One window shuffle — a
    conditional min over the forward frame — never a self-join, so the
    cost is one pass over the partition regardless of how many target
    events follow. Rows with no later target (or beyond ``horizon_sec``)
    are dropped.

    ``order_tiebreak`` (e.g. an event id) makes "next" deterministic
    when timestamps collide; pass it whenever ts is not unique per key.

    Columns: key, ts, latency_us.
    """
    from tits_spark.functions.exprs import epoch_us

    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col(type_col) == to_type, epoch_us(ts_col))
    ).over(w)
    out = (
        df.withColumn("_nxt", nxt)
        .where((F.col(type_col) == from_type) & F.col("_nxt").isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            (F.col("_nxt") - epoch_us(ts_col)).alias("latency_us"),
        )
    )
    if horizon_sec is not None:
        out = out.where(F.col("latency_us") <= horizon_sec * 1_000_000)
    return out


def latency_summary(latencies: DataFrame, key: str = "key") -> DataFrame:
    """Per-key conversion-latency profile over :func:`time_to_event`
    output: count, exact median and p90 (interpolated percentile — the
    same quantile_cont semantics the percentiles query establishes
    cross-engine parity for). Latencies aggregate as exact integer
    microseconds; only the final percentiles are doubles."""
    return latencies.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_conv"),
        F.expr("percentile(latency_us, 0.5)").alias("p50_us"),
        F.expr("percentile(latency_us, 0.9)").alias("p90_us"),
    )


def transition_counts(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    state: str = "event_type",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition estimate over a categorical state
    stream: (from_state, to_state, n, p) where p is row-normalized per
    from_state. One lag window keyed by the entity + one aggregate;
    the probability join is on the tiny per-state totals (broadcast).
    Ties at equal timestamps break on ``order_tiebreak`` when given.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    pairs = (
        df.where(F.col(state).isNotNull())
        .withColumn("_prev", F.lag(state).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_state"),
            F.col(state).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_state").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(tot), "from_state")
        .select(
            "from_state", "to_state", "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
        )
    )


def dispersion_index(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    bucket_secs: int = 3600,
    min_buckets: int = 8,
) -> DataFrame:
    """Index of dispersion (Fano factor) of per-bucket event counts per
    key: D = s^2 / mean over the key's non-empty buckets — D >> 1 flags
    bursty/clustered arrivals, D << 1 over-regular ones (Cox & Lewis;
    the count-process twin of the inter-arrival burstiness diagnostic).

    Exactness: bucket counts are integers, so n, sum(c), sum(c^2) are
    exact and mean / sample variance / D are one fixed double
    expression over them — bit-exact oracle, no quantization. Two
    partial+final aggregates (bucket counts, then moment sums), both
    clustered on the key.
    """
    from tits_spark.functions.exprs import epoch_us, floordiv

    b = floordiv(epoch_us(F.col(ts)), int(bucket_secs) * 1_000_000)
    counts = (
        df.groupBy(F.col(key).alias("key"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("_c").alias("sc"),
        F.sum(F.col("_c") * F.col("_c")).alias("scc"),
    )
    nn = F.col("n_buckets").cast("double")
    sc = F.col("sc").cast("double")
    scc = F.col("scc").cast("double")
    mean = sc / nn
    var = (nn * scc - sc * sc) / (nn * (nn - F.lit(1.0)))
    return (
        agg.where(F.col("n_buckets") >= min_buckets)
        .select(
            "key", "n_buckets", "sc",
            mean.alias("mean_cnt"),
            (var / mean).alias("dispersion"),
        )
    )


def conversion_within(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "view",
    to_type: str = "purchase",
    horizons_sec: tuple[int, ...] = (3600, 86400),
    order_tiebreak: str | None = "event_id",
    decimals: int = 6,
) -> DataFrame:
    """Windowed funnel: per key, the share of ``from_type`` events that
    convert to ``to_type`` within each horizon.

    `time_to_event` answers "how fast do conversions happen" but
    silently conditions on conversion; this keeps the NON-converting
    sources in the denominator — the number a funnel report actually
    wants. Same single forward-window pass (conditional min over the
    following frame, no self-join); counts are exact integers and each
    rate is one integer/integer division rounded ``decimals``.

    Columns: key, n_src, n_conv, n_w<h> + rate_w<h> per horizon.
    """
    from tits_spark.functions.exprs import epoch_us

    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(F.when(F.col(type_col) == to_type, epoch_us(ts_col))).over(w)
    src = (
        df.withColumn("_nxt", nxt)
        .where(F.col(type_col) == from_type)
        .select(
            F.col(key_col).alias("key"),
            (F.col("_nxt") - epoch_us(ts_col)).alias("_lat"),
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_src"),
        F.count("_lat").alias("n_conv"),
    ]
    for h in horizons_sec:
        # when/otherwise (not a bare cast) so never-converting keys sum
        # to an exact 0 rather than an all-NULL aggregate
        aggs.append(
            F.sum(
                F.when(F.col("_lat") <= h * 1_000_000, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias(f"n_w{h}")
        )
    out = src.groupBy("key").agg(*aggs)
    for h in horizons_sec:
        out = out.withColumn(
            f"rate_w{h}", F.round(F.col(f"n_w{h}") / F.col("n_src"), decimals)
        )
    return out


def sequence_motifs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    motifs: tuple[str, ...] = ("vcp", "vp", "ee", "sv"),
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Count non-overlapping event-type motifs in each key's ordered
    event stream.

    The stream is flattened to one character per event (the type's
    initial — distinct across this schema's vocabulary) in strict
    (ts, tiebreak) order, then each motif is a literal substring
    counted left-to-right non-overlapping — identical semantics for
    Spark ``regexp_count`` and DuckDB ``regexp_extract_all``. One
    groupBy building the per-key string (state bounded by the key's
    event count, the same per-key-series bound as the ACF/DTW
    kernels), then pure string expressions.

    Columns: key, seq_len, n_<motif> per motif.
    """
    from tits_spark.functions.exprs import epoch_us

    e = df.select(
        F.col(key_col).alias("key"),
        epoch_us(ts_col).alias("_u"),
        (F.col(order_tiebreak) if order_tiebreak else F.lit(0)).alias("_tb"),
        F.substring(F.col(type_col), 1, 1).alias("_i"),
    )
    seq = e.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_u", "_tb", "_i"))),
                lambda s: s["_i"],
            ),
            "",
        ).alias("_seq")
    )
    cols = [F.col("key"), F.length("_seq").cast("long").alias("seq_len")]
    for m in motifs:
        cols.append(F.regexp_count("_seq", F.lit(m)).cast("long").alias(f"n_{m}"))
    return seq.select(*cols)
