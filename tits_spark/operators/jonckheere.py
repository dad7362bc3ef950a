"""Jonckheere–Terpstra ordered-alternative test per key (Terpstra
1952, Jonckheere 1954; tie-corrected null moments per Hollander &
Wolfe, public formulas): does the value distribution shift MONOTONE
across the ordered 4-hour dayparts of the day (g = hour//4, six
ordered groups)? The ordered-groups complement of the existing
battery: anova/kruskal see ANY heterogeneity, page_trend needs
complete blocks; JT pools every cross-group dominance count in group
order, so a gradual intra-day drift that no single pairwise test
resolves accumulates.

Exact surface: the doubled statistic

    jt2 = 2*JT = sum_{i<j} (2*#{x_i < y_j} + #{x_i = y_j})

is computed WITHOUT pair enumeration from the per-key (cents) value
grid: pivot the six daypart counts c_0..c_5 per distinct value, take
per-group running sums over the value order (strict-below counts),
and fold sum_{i<j} as five prefix terms per grid row — the bounded
6-group analog of mann_whitney's tie-grid device. All integer, one
(key)-window chain on the grid.

Null moments (tie-corrected), all from exact integer aggregates:

    4*E[JT]  = N^2 - sum n_i^2                      (= e4)
    72*var   = A + 2*B/(N(N-1)(N-2)) + 9*C/(N(N-1)) (folded as the
               standard three-term formula; A, B, C exact)
    A = N(N-1)(2N+5) - sum n_i(n_i-1)(2n_i+5) - sum t(t-1)(2t+5)
    B = [sum n_i(n_i-1)(n_i-2)] * [sum t(t-1)(t-2)]
    C = [sum n_i(n_i-1)] * [sum t(t-1)]
    z = (2*jt2 - 2*e4/2) / (4*sigma) -> (2*jt2 - e4) / (4*sigma)

with t the tie-group sizes (grid row totals). z is one fixed double
tree over exact integers, round 6, signed zero normalized.

Plan shape (100 TB): one scan -> hash agg to the per-key distinct-
cents grid (the rank_tests tie grid) -> ONE (key)-window cumsum
chain over the grid -> one hash agg on the same hash(key) exchange.
No joins, no Python, no global windows; the 6-way pivot keeps the
group dimension in fixed columns, so nothing scales with group
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv

DEC = "decimal(38,0)"
N_GROUPS = 6


def jonckheere_daypart(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_n: int = 30,
) -> DataFrame:
    """Per-key Jonckheere–Terpstra z for a monotone shift across the
    six 4-hour dayparts. Returns (key, n, jt2, e4, z_jt); keys below
    ``min_n`` rows, with fewer than two nonempty dayparts, or with a
    degenerate tie structure (var <= 0) drop."""
    mo = max(int(min_n), 5)
    base = df.select(
        F.col(key).alias("key"),
        floordiv(F.hour(ts).cast("long"), 4).alias("g"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    )
    cnt = [
        F.sum(F.when(F.col("g") == i, 1).otherwise(0)).alias(f"c{i}")
        for i in range(N_GROUPS)
    ]
    grid = base.groupBy("key", "c").agg(*cnt)
    wcum = (
        Window.partitionBy("key")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.select(
        "key",
        "c",
        *[F.col(f"c{i}") for i in range(N_GROUPS)],
        *[
            (F.sum(f"c{i}").over(wcum) - F.col(f"c{i}")).alias(f"s{i}")
            for i in range(N_GROUPS)
        ],
    )
    # per-row doubled dominance: sum_j c_j * (2*sum_{i<j} s_i
    #                                         + sum_{i<j} c_i)
    def row_term():
        term = F.lit(0).cast(DEC)
        for j in range(1, N_GROUPS):
            below_strict = sum(F.col(f"s{i}") for i in range(j))
            below_tie = sum(F.col(f"c{i}") for i in range(j))
            term = term + F.col(f"c{j}").cast(DEC) * (
                F.lit(2) * below_strict + below_tie
            )
        return term

    t = sum(F.col(f"c{i}") for i in range(N_GROUPS))  # tie-group size
    agg = cums.groupBy("key").agg(
        F.sum(t).cast("long").alias("n"),
        F.sum(row_term()).alias("_jt2"),
        *[F.sum(f"c{i}").cast("long").alias(f"n{i}") for i in range(N_GROUPS)],
        F.sum((t.cast(DEC) * (t - 1) * (2 * t + 5))).alias("_t1"),
        F.sum((t.cast(DEC) * (t - 1) * (t - 2))).alias("_t2"),
        F.sum((t.cast(DEC) * (t - 1))).alias("_t3"),
    )
    ni = [F.col(f"n{i}").cast(DEC) for i in range(N_GROUPS)]
    nonempty = sum(
        F.when(F.col(f"n{i}") > 0, 1).otherwise(0) for i in range(N_GROUPS)
    )
    nd = F.col("n").cast(DEC)
    sg_sq = sum(x * x for x in ni)
    sg1 = sum(x * (x - 1) * (2 * x + 5) for x in ni)
    sg2 = sum(x * (x - 1) * (x - 2) for x in ni)
    sg3 = sum(x * (x - 1) for x in ni)
    e4 = (nd * nd - sg_sq).alias("_e4")
    a = nd * (nd - 1) * (2 * nd + 5) - sg1 - F.col("_t1")
    var = (
        a.cast("double") / F.lit(72.0)
        + (sg2 * F.col("_t2")).cast("double")
        / (F.lit(36.0) * (nd * (nd - 1) * (nd - 2)).cast("double"))
        + (sg3 * F.col("_t3")).cast("double")
        / (F.lit(8.0) * (nd * (nd - 1)).cast("double"))
    )
    withm = agg.filter((F.col("n") >= mo) & (nonempty >= 2)).select(
        "key", "n", "_jt2", e4, var.alias("_var")
    )
    z = F.round(
        (F.lit(2.0) * F.col("_jt2").cast("double") - F.col("_e4").cast("double"))
        / (F.lit(4.0) * F.sqrt(F.col("_var"))),
        6,
    ) + F.lit(0.0)
    return withm.filter(F.col("_var") > 0).select(
        "key",
        "n",
        F.col("_jt2").cast("long").alias("jt2"),
        F.col("_e4").cast("long").alias("e4"),
        z.alias("z_jt"),
    )
