"""Hayashi-Yoshida asynchronous covariance + HRY lead-lag scan.

Two irregular series X and Y on the same key, observed at DIFFERENT
times, correlated WITHOUT resampling either one — the Hayashi-Yoshida
(2005, Bernoulli 11(2)) estimator sums increment products over every
pair of OVERLAPPING observation intervals:

    HY-cov = sum_{i,j} dX_i * dY_j * 1[(s_{i-1}, s_i] cap (t_{j-1}, t_j] != {}]

This is the purest tits-style problem (gap-aware alignment of
asynchronous series; ref:/root/reference/src/sacf.c:166-179 aligns via
kernel bands, ref:guess_lag.c resamples first) solved with NO grid and
NO information loss.

Scale design — the naive formulation is a per-key interval-overlap
range join (quadratic per key, and Spark plans non-equi joins as
cartesian-per-key). We never build it. Because the Y intervals TILE
the Y observation span, the j's overlapping one X interval form a
contiguous run, and their increments TELESCOPE:

    sum_j dY_j over the run = Y(fwd-asof(s_i)) - Y(bwd-asof(s_{i-1}))

(with the run clamped to Y's first/last tick at the edges — an X
interval wholly outside Y's span telescopes to 0). So the whole
estimator is TWO as-of alignments (the union-LOCF window device of
operators/resample.py — one shuffle on the key, reused by both passes
since the partitioning is identical) + one exact aggregation. O(n log n)
per key, no range join, no UDF, no explode. The overlapping-pair COUNT
falls out of the same telescope on tick row-numbers, so the structure
(not just the sums) is oracle-checked.

Exactness (the repo's integer-moment discipline): values quantize to
BIGINT cents; duplicate (key, series, ts) ticks are collapsed to
max(cents) FIRST (documented determinism guard — makes interval
construction well-defined under timestamp ties on any engine);
increment products accumulate in decimal(38,0) (HUGEINT in the
oracle); the only float op is the final corr = cov/sqrt(vx*vy), one
double expression over exact integers, written identically on both
engines, with `+ 0.0` normalizing IEEE signed zero.

HRY lead-lag (Hoffmann-Rosenbaum-Yoshida 2013): HY-cov is re-scanned
over a small shift lattice theta (X moved by theta); because vx and vy
are shift-INVARIANT, argmax_theta |corr(theta)| == argmax |cov_q(theta)|
— an EXACT integer comparison, so the chosen lag can never flip on a
float boundary. The lattice explode is bounded (|Theta| copies of the
already-reduced interval/tick frames), windows partition by
(key, theta): the same bounded-lattice economics as event_study.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def _ticks(df: DataFrame, key: str, ts: str, value: str,
           series: str) -> DataFrame:
    """Quantize to cents and collapse duplicate (key, series, ts) ticks
    to max(cents) — the documented determinism guard."""
    return (
        df.select(
            F.col(key).alias("key"),
            F.col(series).alias("s"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "s", "us")
        .agg(F.max("c").alias("c"))
    )


def _base(ticks: DataFrame) -> DataFrame:
    """ONE (key, s)-partitioned window pass derives everything both
    sides need — the (b, e] increment intervals, the tick values, and
    the per-side tick row-numbers (the pair-count telescope). The
    frame is persisted because three branches consume it (X intervals,
    Y ticks, Y realized variance): without the cache each branch
    re-triggers the raw scan + collapse (the tfidf-weights /
    tpch_q17 persist precedent; callers that care can clearCache)."""
    w = Window.partitionBy("key", "s").orderBy("us")
    return ticks.select(
        "key", "s",
        F.lag("us").over(w).alias("b"),
        F.col("us").alias("e"),
        "c",
        (F.col("c") - F.lag("c").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    ).persist()


def hy_cov(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
) -> DataFrame:
    """Per-key Hayashi-Yoshida covariance of the two sides of
    ``series`` (values in ``value``, quantized to cents).

    Returns (key, n_pairs, cov_q, vx_q, vy_q, hy_corr): the exact
    decimal(38,0) increment-product sum over overlapping interval
    pairs, the exact overlap-pair count, the two realized variances
    (exact cents^2), and the HY correlation (one double expression).
    Keys need >= 1 increment on BOTH sides to appear.
    """
    base = _base(_ticks(df, key, ts, value, series))
    xiv = base.filter(
        (F.col("s") == x_side) & F.col("b").isNotNull()
    ).select("key", "b", "e", "d")
    # Y ticks with row-numbers: the telescope over rn gives the exact
    # overlapping-pair count (count_i = rn_fwd(e_i) - rn_bwd(b_i),
    # clamped to [1, m] at the edges).
    yt = base.filter(F.col("s") == y_side).select(
        "key", F.col("e").alias("us"), "c", "rn"
    )

    # ---- pass A: backward as-of at the interval START b ------------
    # union-LOCF: Y ticks sort BEFORE X rows at equal anchor (<= b is
    # inclusive); last(ignorenulls) carries (y, rn) forward.
    xa = xiv.select(
        "key", F.col("b").alias("anchor"), F.lit(1).alias("side"),
        "b", "e", "d",
        F.lit(None).cast("long").alias("y"),
        F.lit(None).cast("int").alias("yrn"),
    )
    ya = yt.select(
        "key", F.col("us").alias("anchor"), F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("b"),
        F.lit(None).cast("long").alias("e"),
        F.lit(None).cast("long").alias("d"),
        F.col("c").alias("y"), F.col("rn").alias("yrn"),
    )
    wb = (
        Window.partitionBy("key")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfull = (
        Window.partitionBy("key")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    passa = (
        xa.unionByName(ya)
        .select(
            "*",
            F.last("y", ignorenulls=True).over(wb).alias("y_bwd"),
            F.last("yrn", ignorenulls=True).over(wb).alias("rn_bwd"),
            F.first("y", ignorenulls=True).over(wfull).alias("y_first"),
        )
        .filter(F.col("side") == 1)
        .select(
            "key", "e", "d",
            # edge clamp: no Y tick <= b -> run starts at Y's first tick
            F.coalesce("y_bwd", "y_first").alias("y_bwd"),
            F.coalesce("rn_bwd", F.lit(1)).alias("rn_bwd"),
        )
    )

    # ---- pass B: forward as-of at the interval END e ----------------
    # X rows sort BEFORE Y ticks at equal anchor (>= e is inclusive);
    # first(ignorenulls) looks ahead.
    xb = passa.select(
        "key", F.col("e").alias("anchor"), F.lit(0).alias("side"),
        "d", "y_bwd", "rn_bwd",
        F.lit(None).cast("long").alias("y"),
        F.lit(None).cast("int").alias("yrn"),
    )
    yb = yt.select(
        "key", F.col("us").alias("anchor"), F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("d"),
        F.lit(None).cast("long").alias("y_bwd"),
        F.lit(None).cast("int").alias("rn_bwd"),
        F.col("c").alias("y"), F.col("rn").alias("yrn"),
    )
    wf = (
        Window.partitionBy("key")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    wfull2 = (
        Window.partitionBy("key")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    passb = (
        xb.unionByName(yb)
        .select(
            "*",
            F.first("y", ignorenulls=True).over(wf).alias("y_fwd"),
            F.first("yrn", ignorenulls=True).over(wf).alias("rn_fwd"),
            F.last("y", ignorenulls=True).over(wfull2).alias("y_last"),
            F.last("yrn", ignorenulls=True).over(wfull2).alias("rn_last"),
        )
        .filter(F.col("side") == 0)
        .select(
            "key", "d", "y_bwd", "rn_bwd",
            # edge clamp: no Y tick >= e -> run ends at Y's last tick
            F.coalesce("y_fwd", "y_last").alias("y_fwd"),
            F.coalesce("rn_fwd", "rn_last").alias("rn_fwd"),
        )
    )

    # telescope: each X interval contributes d * (Y_fwd - Y_bwd) and
    # (rn_fwd - rn_bwd) overlapping pairs — exact integers throughout.
    per_key = passb.groupBy("key").agg(
        F.sum(
            (F.col("rn_fwd") - F.col("rn_bwd")).cast("long")
        ).alias("n_pairs"),
        F.sum(
            (F.col("d") * (F.col("y_fwd") - F.col("y_bwd"))).cast(DEC)
        ).alias("cov_q"),
        F.sum((F.col("d") * F.col("d")).cast(DEC)).alias("vx_q"),
    )
    vy = (
        base.filter((F.col("s") == y_side) & F.col("b").isNotNull())
        .groupBy("key")
        .agg(F.sum((F.col("d") * F.col("d")).cast(DEC)).alias("vy_q"))
    )
    out = per_key.join(vy, "key")
    corr = (
        F.col("cov_q").cast("double")
        / F.sqrt(F.col("vx_q").cast("double") * F.col("vy_q").cast("double"))
    )
    return out.select(
        "key", "n_pairs", "cov_q", "vx_q", "vy_q",
        F.when(
            (F.col("vx_q") > 0) & (F.col("vy_q") > 0),
            F.round(corr, 6) + F.lit(0.0),
        ).alias("hy_corr"),
    )


def hy_lead_lag(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    offsets_s: tuple[int, ...] = (-7200, -3600, 0, 3600, 7200),
) -> DataFrame:
    """HRY lead-lag scan: HY-cov with X shifted by each theta in
    ``offsets_s``. Returns (key, theta_s, cov_q, is_best) where
    is_best marks argmax |cov_q| (exact integer compare; vx/vy are
    shift-invariant so this IS argmax |corr|), ties to the smaller
    theta. theta_s > 0 best means X leads Y by theta.
    """
    base = _base(_ticks(df, key, ts, value, series))
    lat = F.explode(
        F.array(*[F.lit(int(t)) for t in offsets_s])
    ).alias("theta_s")
    # shift is applied to the ALREADY-REDUCED interval frame (dx and
    # interval bounds are shift-equivariant) — the raw scan runs once.
    xiv = (
        base.filter((F.col("s") == x_side) & F.col("b").isNotNull())
        .select("key", "b", "e", "d", lat)
        .select(
            "key", "theta_s",
            (F.col("b") + F.col("theta_s").cast("long") * 1_000_000)
            .alias("b"),
            (F.col("e") + F.col("theta_s").cast("long") * 1_000_000)
            .alias("e"),
            "d",
        )
    )
    yt = (
        base.filter(F.col("s") == y_side)
        .select("key", F.col("e").alias("us"), "c", lat)
        .select("key", "theta_s", "us", "c")
    )

    wb = (
        Window.partitionBy("key", "theta_s")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfull = (
        Window.partitionBy("key", "theta_s")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    xa = xiv.select(
        "key", "theta_s", F.col("b").alias("anchor"),
        F.lit(1).alias("side"), "e", "d",
        F.lit(None).cast("long").alias("y"),
    )
    ya = yt.select(
        "key", "theta_s", F.col("us").alias("anchor"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("e"),
        F.lit(None).cast("long").alias("d"),
        F.col("c").alias("y"),
    )
    passa = (
        xa.unionByName(ya)
        .select(
            "*",
            F.last("y", ignorenulls=True).over(wb).alias("y_bwd0"),
            F.first("y", ignorenulls=True).over(wfull).alias("y_first"),
        )
        .filter(F.col("side") == 1)
        .select(
            "key", "theta_s", "e", "d",
            F.coalesce("y_bwd0", "y_first").alias("y_bwd"),
        )
    )

    wf = (
        Window.partitionBy("key", "theta_s")
        .orderBy(F.col("anchor").asc(), F.col("side").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    xb = passa.select(
        "key", "theta_s", F.col("e").alias("anchor"),
        F.lit(0).alias("side"), "d", "y_bwd",
        F.lit(None).cast("long").alias("y"),
    )
    yb = yt.select(
        "key", "theta_s", F.col("us").alias("anchor"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("d"),
        F.lit(None).cast("long").alias("y_bwd"),
        F.col("c").alias("y"),
    )
    passb = (
        xb.unionByName(yb)
        .select(
            "*",
            F.first("y", ignorenulls=True).over(wf).alias("y_fwd0"),
            F.last("y", ignorenulls=True).over(wfull).alias("y_last"),
        )
        .filter(F.col("side") == 0)
        .select(
            "key", "theta_s", "d", "y_bwd",
            F.coalesce("y_fwd0", "y_last").alias("y_fwd"),
        )
    )
    per = passb.groupBy("key", "theta_s").agg(
        F.sum(
            (F.col("d") * (F.col("y_fwd") - F.col("y_bwd"))).cast(DEC)
        ).alias("cov_q")
    )
    wbest = Window.partitionBy("key").orderBy(
        F.abs(F.col("cov_q")).desc(), F.col("theta_s").asc()
    )
    return per.select(
        "key", "theta_s", "cov_q",
        (F.row_number().over(wbest) == 1).alias("is_best"),
    )
