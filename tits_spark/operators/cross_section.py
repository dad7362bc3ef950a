"""Cross-sectional analytics: rank entities against each other WITHIN
a time bucket (the transpose of everything else in this package, which
ranks time within an entity).

The market-data idiom ("top decile of movers this minute"), equally
the transcript idiom ("which conversations dominated this hour").
Plan: one groupBy on (key, bucket) — partial+final hash agg — then one
window partitioned by bucket only. The bucket window is safe at scale
because its partition count is the number of buckets (time), not
entities; a single bucket's cross-section (#entities) must fit a task,
which holds until ~10^8 simultaneously-active keys per bucket — past
that, use the two-phase top-k in windows.top_k instead of full ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.rollup import bucket_col


def cross_rank(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    tier: str = "1h",
    quantize: int = 6,
) -> DataFrame:
    """Per-bucket cross-section: each key's activity total, its rank
    (1 = largest) and percentile among all keys active in the bucket.

    The ranked measure is the bucket sum QUANTIZED to ``quantize``
    decimals before comparison (float sums are order-dependent in the
    last ulp; ranking unquantized sums would be nondeterministic
    across partitionings), with key as the total-order tie-break.
    Percentile is exact integer arithmetic (rank-1)/(n-1).
    """
    q = F.round(F.sum(value), quantize)
    agg = df.groupBy(
        F.col(key).alias("key"), bucket_col(ts, tier).alias("bucket_ts")
    ).agg(q.alias("v_total"), F.count(value).alias("n_obs"))
    w = Window.partitionBy("bucket_ts").orderBy(
        F.col("v_total").desc(), F.col("key").asc()
    )
    n_keys = F.count(F.lit(1)).over(Window.partitionBy("bucket_ts"))
    rk = F.row_number().over(w)
    return agg.select(
        "key",
        "bucket_ts",
        "v_total",
        "n_obs",
        rk.alias("rnk"),
        n_keys.alias("n_keys"),
        F.when(n_keys > 1, (rk - F.lit(1)).cast("double") / (n_keys - F.lit(1)))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
    )


def ecdf_ranks(
    df: DataFrame, key: str = "key", value: str = "value"
) -> DataFrame:
    """Per-key empirical CDF columns for every row: percent_rank
    (min-rank scaled to [0,1]) and ecdf = P(X <= x) (cume_dist). Both
    are exact integer ratios — (rank-1)/(n-1) and count<=x / n — so the
    oracle matches bit-for-bit with no quantization. One hash-partition
    window per key; ties share ranks deterministically."""
    w = Window.partitionBy(key).orderBy(value)
    return df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"),
        F.col(value).alias("value"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("ecdf"),
    )


def topk_per_group(
    df: DataFrame,
    group: str,
    key: str,
    value: str = "value",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` keys per group by event count (heavy hitters within
    each group): aggregate first (partial+final, exact integer counts
    and cents), then ONE rank window per group over the aggregate —
    bounded by distinct (group, key), never raw rows. The order
    (n desc, key asc) is total, so ranks are deterministic and the
    oracle matches bit-for-bit."""
    agg = (
        df.groupBy(F.col(group).alias("grp"), F.col(key).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col(value) * 100, 0).cast("long")).alias("cents"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("k"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("grp", "k", "n", "cents", "rank")
    )


def bh_fdr(
    stats: DataFrame,
    key: str = "key",
    stat: str = "stat",
    p: str = "p",
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg (1995) FDR control across the key
    cross-section: given one (key, statistic, p-value) row per key,
    find k* = max{ k : p_(k) <= k * alpha / m } and reject the k*
    smallest p-values — the multiple-testing layer every per-key test
    family in this package needs before anyone acts on "150 keys, 9
    significant at 5%" (7.5 are expected by chance).

    Determinism: the ranking order (p, key) is total; the step-up
    comparison p <= alpha * rank / m runs over identical doubles on
    both engines (p itself must be an engine-identical double — e.g.
    a closed-form transform of a round-6 statistic). NULL p rows drop
    (their family already reported the degenerate pole).

    Returns (key, stat, p, rnk, m, k_star, reject).

    Scale note: the frame is the per-key statistic table — ONE row
    per key, already the cross-sectional reduction of the raw stream.
    The global rank window funnels it through one task, fine to ~1e8
    keys (cross_rank's bound); past that, replace the rank with a
    two-phase distributed quantile search on p.
    """
    a = float(alpha)
    if not 0.0 < a < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    base = stats.select(
        F.col(key).alias("key"),
        F.col(stat).alias("stat"),
        F.col(p).alias("p"),
    ).filter(F.col("p").isNotNull())
    # bounded-global-window: frame = one row per key (the per-key test
    # statistic table), the cross-sectional reduction — cross_rank's
    # documented ~1e8-key bound applies
    wg = Window.orderBy(F.asc("p"), F.asc("key"))
    # bounded-global-window: same one-row-per-key frame as above
    wall = Window.partitionBy()
    ranked = base.select(
        "key",
        "stat",
        "p",
        F.row_number().over(wg).alias("rnk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    ok = F.col("p") <= F.lit(a) * F.col("rnk").cast("double") / F.col(
        "m"
    ).cast("double")
    flagged = ranked.select(
        "key",
        "stat",
        "p",
        "rnk",
        "m",
        # bounded-global-window: max over the same per-key frame
        F.coalesce(
            F.max(F.when(ok, F.col("rnk"))).over(wall), F.lit(0)
        ).alias("k_star"),
    )
    return flagged.select(
        "key",
        "stat",
        "p",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("m").cast("long").alias("m"),
        F.col("k_star").cast("long").alias("k_star"),
        (F.col("rnk") <= F.col("k_star")).alias("reject"),
    )
