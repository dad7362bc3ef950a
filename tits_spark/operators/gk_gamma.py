"""Goodman-Kruskal gamma, Somers' d_yx and Kendall tau-b per key on
the (hour-of-day, value-quartile) ordinal lattice — does the value
level RISE with the time of day? The ordinal-category companion of
kendall (pairwise on raw series) and chi2_indep (nominal, order-blind
on the same hour lattice): gamma/Somers see the ORDER of categories
that chi-square deliberately ignores.

Quartile protocol: per-key value thresholds are COPIED order
statistics at integer ranks (k*n)//4, k = 1..3, over the (cents, us)
order (var_backtest's device — rank arithmetic only, no float
quantile); a row's bucket is the exact count of thresholds strictly
below its cents value, so equal values always share a bucket and both
engines agree bit-for-bit.

With cell counts n(h, b) over the bounded 24 x 4 lattice, the pair
counts are exact integers:

    C   = sum_{h1<h2, b1<b2} n1 * n2       (concordant)
    D   = sum_{h1<h2, b1>b2} n1 * n2       (discordant)
    T   = n(n-1)/2, Tx = sum_h nh(nh-1)/2, Ty = sum_b nb(nb-1)/2
          (total / tied-on-hour / tied-on-bucket pairs, from
          marginals — no pair enumeration)

    gamma      = (C - D) / (C + D)
    somers_dyx = (C - D) / (T - Tx)
    tau_b      = (C - D) / sqrt((T - Tx) * (T - Ty))

Exactness: all counts on the DECIMAL(38,0) lattice (C is O(n^2): a
10^9-row key drives it to 10^18, the BIGINT edge); each statistic is
one double division (or one sqrt then divide) over exact integers,
round 6, signed-zero normalized.

Plan shape (100 TB): the raw stream collapses to <= 96 cells per key
BEFORE the only join — a per-key equi-join of the cell frame with
itself whose fan-out is capped at 96^2/2 pairs per key (the
triangles/drift bounded-lattice discipline; no cartesian, asserted).
Threshold ranks ride one (key)-partitioned window chain on the raw,
the same hashpartitioning the cell aggregate reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def gk_ordinal_assoc(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 16,
) -> DataFrame:
    """Gamma / Somers' d_yx / tau-b of value quartile vs hour-of-day.

    Returns (key, n, c_pairs, d_pairs, t_x, t_y, gamma, somers_dyx,
    tau_b); gamma NULL when C + D = 0 (all pairs tied). Keys below
    ``min_obs`` rows drop.
    """
    mo = max(int(min_obs), 4)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.hour(ts).cast("long").alias("h"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    )
    wk = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("c", "us")
    ranked = base.select(
        "key",
        "h",
        "c",
        F.row_number().over(wo).alias("r"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("n") >= mo)
    thr = ranked.select(
        "key",
        "h",
        "c",
        "n",
        *[
            F.max(
                F.when(
                    F.col("r") == floordiv(F.lit(k) * F.col("n"), 4),
                    F.col("c"),
                )
            ).over(wk).alias(f"t{k}")
            for k in (1, 2, 3)
        ],
    )
    bucketed = thr.select(
        "key",
        "h",
        "n",
        (
            (F.col("c") > F.col("t1")).cast("long")
            + (F.col("c") > F.col("t2")).cast("long")
            + (F.col("c") > F.col("t3")).cast("long")
        ).alias("b"),
    )
    # four consumers (both join sides, both marginals) derive from
    # this <= 96-rows-per-key frame: persist it so the raw scan +
    # window chain runs ONCE, not four times (the lexical.py weights
    # precedent; without it the plan shows 4 parquet scans)
    cells = bucketed.groupBy("key", "h", "b").agg(
        F.count(F.lit(1)).alias("m"), F.max("n").alias("n")
    ).persist()

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # bounded per-key cell cross: <= 96 cells a side
    lhs = cells.select("key", F.col("h").alias("h1"), F.col("b").alias("b1"),
                       F.col("m").alias("m1"))
    rhs = cells.select("key", F.col("h").alias("h2"), F.col("b").alias("b2"),
                       F.col("m").alias("m2"))
    pairs = lhs.join(rhs, "key").filter(F.col("h1") < F.col("h2"))
    cd = pairs.groupBy("key").agg(
        F.sum(
            F.when(F.col("b1") < F.col("b2"), dec(F.col("m1")) * dec(F.col("m2")))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("c_pairs"),
        F.sum(
            F.when(F.col("b1") > F.col("b2"), dec(F.col("m1")) * dec(F.col("m2")))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("d_pairs"),
    )

    # tie terms from marginals — no pair enumeration
    hx = cells.groupBy("key", "h").agg(F.sum("m").alias("mh"), F.max("n").alias("n"))
    tx = hx.groupBy("key").agg(
        F.sum(dec(F.col("mh")) * dec(F.col("mh") - 1) / 2).alias("t_x"),
        F.max("n").alias("n"),
    )
    by = cells.groupBy("key", "b").agg(F.sum("m").alias("mb"))
    ty = by.groupBy("key").agg(
        F.sum(dec(F.col("mb")) * dec(F.col("mb") - 1) / 2).alias("t_y")
    )
    # left join: a key whose rows all share one hour has NO h1<h2 cell
    # pair and must still report (C, D) = (0, 0), not drop
    zero = F.lit(0).cast("decimal(38,0)")
    agg = (
        tx.join(ty, "key")
        .join(cd, "key", "left")
        .withColumn("c_pairs", F.coalesce(F.col("c_pairs"), zero))
        .withColumn("d_pairs", F.coalesce(F.col("d_pairs"), zero))
    )

    t_all = dec(F.col("n")) * dec(F.col("n") - 1) / 2
    cmd = (F.col("c_pairs") - F.col("d_pairs")).cast("double")
    cpd = (F.col("c_pairs") + F.col("d_pairs")).cast("double")
    nx = (t_all - F.col("t_x")).cast("double")
    ny = (t_all - F.col("t_y")).cast("double")
    gamma = F.when(
        F.col("c_pairs") + F.col("d_pairs") > 0,
        F.round(cmd / cpd, 6) + F.lit(0.0),
    )
    somers = F.when(nx > 0, F.round(cmd / nx, 6) + F.lit(0.0))
    tau_b = F.when(
        (nx > 0) & (ny > 0), F.round(cmd / F.sqrt(nx * ny), 6) + F.lit(0.0)
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.col("c_pairs").cast("long").alias("c_pairs"),
        F.col("d_pairs").cast("long").alias("d_pairs"),
        F.col("t_x").cast("long").alias("t_x"),
        F.col("t_y").cast("long").alias("t_y"),
        gamma.alias("gamma"),
        somers.alias("somers_dyx"),
        tau_b.alias("tau_b"),
    )
