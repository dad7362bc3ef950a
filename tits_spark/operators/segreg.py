"""Segmented regression: the best single structural break per key.

For each candidate breakpoint i the series splits into [1..i] and
[i+1..n]; each side gets its own least-squares line, and the winner
minimizes the pooled SSE — the classic two-piece structural-break fit
(Quandt 1958 / Bai & Perron's single-break case, public formulas; the
regression sibling of the Pettitt/CUSUM changepoints already in
operators/changepoint.py, which test LEVEL shifts — this one finds
SLOPE regime changes).

Spark-first evaluation: every candidate's left moments are PREFIX
sums over one ordered window pass, the right moments are
total - prefix; with x = the row index and y = exact cents, all six
moments (n, Sx, Sxx, Sy, Syy, Sxy) are exact integers, so each
candidate's SSE is a fixed double expression over exact decimal
inputs — every engine computes the identical value, and the argmin is
deterministic (ties break on the earlier index). Cost: one window
shuffle + one per-key min — O(n) per key with NO self-join, against
the textbook O(n^2) refit.

Overflow bounds: the squared centered moments reach ~(n^2 * cents)^2;
decimal(38,0) carries series up to ~10^7 rows/key at dollar scale —
far past any per-key series this engine shards (HUGEINT on the oracle
side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sse(n, sx, sxx, sy, syy, sxy):
    # n*SSE identity: n*Syy - Sy^2 - (n*Sxy - Sx*Sy)^2 / (n*Sxx - Sx^2),
    # all inputs exact decimals -> identical doubles on both engines
    nd = n.cast("double")
    vxx = (n * sxx - sx * sx).cast("double")
    vxy = (n * sxy - sx * sy).cast("double")
    vyy = (n * syy - sy * sy).cast("double")
    return (vyy - vxy * vxy / vxx) / nd


def segmented_fit(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_seg: int = 3,
) -> DataFrame:
    """Best two-piece linear fit per key over (index, cents).

    Returns (key, n, brk, slope_l_u6, slope_r_u6, sse_ratio_u6):
    ``brk`` is the last index of the left segment, slopes are in
    cents/step on the floor-1e6 lattice, and sse_ratio is
    (pooled two-piece SSE) / (single-line SSE) — near 0 means a hard
    regime change, near 1e6 means no break. Keys shorter than
    2*min_seg drop out."""
    ms = int(min_seg)
    if ms < 2:
        # a line fit needs two points per side: min_seg=1 makes vxx=0
        # in _sse and the NaN/Inf doubles it produces sort into the
        # argmin nondeterministically across engines
        raise ValueError(f"segmented_fit: min_seg must be >= 2, got {ms}")
    cents = F.round(F.col(value) * 100).cast("long")
    wo = Window.partitionBy("key").orderBy("ts", "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    base = (
        df.select(F.col(key).alias("key"), F.col(ts).alias("ts"), cents.alias("y"))
        .withColumn("i", F.row_number().over(wo))
        .select("key", "i", "y")
    )
    run = Window.partitionBy("key").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("key")
    terms = (
        base
        .withColumn("_x", dec("i"))
        .withColumn("_xx", (dec("i") * dec("i")).cast("decimal(38,0)"))
        .withColumn("_y", dec("y"))
        .withColumn("_yy", (dec("y") * dec("y")).cast("decimal(38,0)"))
        .withColumn("_xy", (dec("i") * dec("y")).cast("decimal(38,0)"))
    )
    # prefix sums (ordered frame) AND full-partition totals of the SAME
    # per-row terms — totals must be sums, not last/max, because cents
    # are signed and the cumulative series is not monotone
    m = (
        terms
        .withColumn("sx", F.sum("_x").over(run))
        .withColumn("sxx", F.sum("_xx").over(run))
        .withColumn("sy", F.sum("_y").over(run))
        .withColumn("syy", F.sum("_yy").over(run))
        .withColumn("sxy", F.sum("_xy").over(run))
        .withColumn("n", F.max("i").over(tot))
        .withColumn("tx", F.sum("_x").over(tot))
        .withColumn("txx", F.sum("_xx").over(tot))
        .withColumn("ty", F.sum("_y").over(tot))
        .withColumn("tyy", F.sum("_yy").over(tot))
        .withColumn("txy", F.sum("_xy").over(tot))
    )
    nl = F.col("i").cast("decimal(38,0)")
    nr = (F.col("n") - F.col("i")).cast("decimal(38,0)")
    sse_l = _sse(nl, F.col("sx"), F.col("sxx"), F.col("sy"), F.col("syy"), F.col("sxy"))
    sse_r = _sse(
        nr,
        F.col("tx") - F.col("sx"),
        F.col("txx") - F.col("sxx"),
        F.col("ty") - F.col("sy"),
        F.col("tyy") - F.col("syy"),
        F.col("txy") - F.col("sxy"),
    )
    slope_l = (nl * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        nl * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    slope_r_num = (nr * (F.col("txy") - F.col("sxy"))
                   - (F.col("tx") - F.col("sx")) * (F.col("ty") - F.col("sy")))
    slope_r_den = (nr * (F.col("txx") - F.col("sxx"))
                   - (F.col("tx") - F.col("sx")) * (F.col("tx") - F.col("sx")))
    slope_r = slope_r_num.cast("double") / slope_r_den.cast("double")
    nn = F.col("n").cast("decimal(38,0)")
    sse_1 = _sse(nn, F.col("tx"), F.col("txx"), F.col("ty"), F.col("tyy"), F.col("txy"))
    cand = (
        m.filter((F.col("i") >= ms) & (F.col("i") <= F.col("n") - ms))
        .withColumn("sse2", sse_l + sse_r)
        .withColumn("sl", slope_l)
        .withColumn("sr", slope_r)
        .withColumn("sse1", sse_1)
    )
    # identical doubles on both engines -> the (sse2, i) order is
    # engine-independent; row_number picks the unique winner
    ww = Window.partitionBy("key").orderBy(F.asc("sse2"), F.asc("i"))
    best = cand.withColumn("_rk", F.row_number().over(ww)).filter(F.col("_rk") == 1)
    return best.select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.col("i").cast("long").alias("brk"),
        F.floor(F.col("sl") * 1e6).cast("long").alias("slope_l_u6"),
        F.floor(F.col("sr") * 1e6).cast("long").alias("slope_r_u6"),
        F.when(
            F.col("sse1") > 0,
            F.floor(F.col("sse2") / F.col("sse1") * 1e6).cast("long"),
        ).alias("sse_ratio_u6"),
    )
