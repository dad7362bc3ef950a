"""Two-sample Cramér–von Mises criterion per key (Anderson & Darling
1952; Anderson, "On the distribution of the two-sample Cramér–von
Mises criterion", Ann. Math. Stat. 1962 — public rank formula): the
omnibus EDF distance completing the two-sample battery — mann_whitney
sees location, brown_forsythe scale, ww_runs/lepage either, ks_test
the sup-norm; CvM integrates the SQUARED EDF gap over the whole
merged sample, so it picks up broad-band shape differences a single
extreme point (KS) or a rank mean (MW) can miss.

With combined ranks r_i (a-sample, i = 1..n within-sample index) and
s_j (b-sample) in the deterministic (cents, us, label) total order:

    U = n * sum_i (r_i - i)^2 + m * sum_j (s_j - j)^2
    T = U / (n*m*N) - (4*n*m - 1) / (6*N),      N = n + m

E[T] under H0 is (1 + 1/N)/6 ~ 1/6; large T rejects equality.

Tie determinism: the house (cents, us) order is extended by the
label so a full tie (same key, cents, us, label) is only between
interchangeable same-label rows; the within-sample index i is then
derived by ranking the COMBINED rank r itself within (key, label) —
never by an independent second sort — so whichever arbitrary
tie-break r lands on, i follows it consistently and the (r - i)
multiset (hence the statistic) is assignment-invariant by
construction on both engines. (An independent (cents, us) sort for
i would be one unstable sort away from pairing r and i
inconsistently across a full tie.)

Exactness: r, i and each (r-i)^2 are exact integers ((r-i)^2 <= N^2
per row, int64-safe); the two squared sums accumulate in
decimal(38,0) and are emitted as BIGINT (sum <= N^3: exact below
N ~ 2.1M rows/key — the documented emit ceiling; U itself stays on
the decimal lattice for the statistic). T is ONE fixed double tree
over exact integers, round 6, signed zero normalized.

Plan shape (100 TB): one scan -> two window functions that share the
hash(key) exchange (the (key, a) partition is a refinement of (key),
Spark plans one Exchange + two Sorts) -> one hash agg on the same
partitioning. No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def cvm_two_sample(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key two-sample Cramér–von Mises T between rows flagged
    ``is_a`` and the rest. Returns (key, n_a, n_b, sq_a, sq_b,
    cvm_t); keys with either sample below ``min_each`` drop."""
    me = max(int(min_each), 2)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    w_all = Window.partitionBy("key").orderBy("c", "us", "a")
    w_lab = Window.partitionBy("key", "a").orderBy("r")
    ranked = base.select(
        "key", "a", F.row_number().over(w_all).alias("r")
    ).select(
        "key",
        "a",
        (F.col("r") - F.row_number().over(w_lab)).alias("_d"),
    )
    sq = (F.col("_d").cast(DEC) * F.col("_d")).cast(DEC)
    agg = (
        ranked.groupBy("key")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(F.lit(1) - F.col("a")).cast("long").alias("n_b"),
            F.sum(F.when(F.col("a") == 1, sq)).alias("_sqa"),
            F.sum(F.when(F.col("a") == 0, sq)).alias("_sqb"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    n = F.col("n_a").cast(DEC)
    m = F.col("n_b").cast(DEC)
    nn = n + m
    u = n * F.col("_sqa") + m * F.col("_sqb")
    t = (
        F.round(
            u.cast("double") / (n * m * nn).cast("double")
            - (F.lit(4).cast(DEC) * n * m - 1).cast("double")
            / (F.lit(6).cast(DEC) * nn).cast("double"),
            6,
        )
        + F.lit(0.0)
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("_sqa").cast("long").alias("sq_a"),
        F.col("_sqb").cast("long").alias("sq_b"),
        t.alias("cvm_t"),
    )
