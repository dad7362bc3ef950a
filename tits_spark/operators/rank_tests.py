"""Rank-based two-sample / k-sample tests, fully declarative (no UDFs
— every statistic is hash-agg + key-partitioned-window algebra that
Catalyst keeps inside whole-stage codegen).

These are the nonparametric companions of :mod:`stat_tests` (the
location / dispersion / distribution screens a rollup pipeline runs
against its tiers before trusting a series — reference analog: the
eligibility screens tits' guess_lag applies, ref:
/root/reference/src/tsa.h:1 family):

 - :func:`mann_whitney` — Mann–Whitney U (Wilcoxon rank-sum) location
   test between two labeled samples per key, tie-corrected.
 - :func:`kruskal_wallis` — k-sample rank ANOVA per key across a
   group column, tie-corrected H.
 - :func:`cvm_two_sample` — Cramér–von Mises two-sample distance per
   key (the integral sibling of KS: sensitive to the whole ECDF gap,
   not just its max).
 - :func:`anderson_darling` — tie-adjusted two-sample Anderson–Darling
   A² per key (Scholz & Stephens 1987 A²_akN, k=2): the
   tail-weighted sibling of CvM.

Exactness discipline: all ranks are midranks kept on the DOUBLED
integer lattice (``2*midrank = 2*prev + t + 1`` for a tie group of
size ``t`` whose first combined position is ``prev + 1``), so every
rank sum, tie-correction term and ECDF-difference numerator is an
exact BIGINT / DECIMAL(38,0) and engines agree bit-for-bit; only the
final standardization divides, rounded to 6dp.

Scale notes (100 TB): each test is one hash aggregation on
(key, value) — collapsing the raw row stream BEFORE any window — plus
one key-partitioned cumulative window over the per-key distinct-value
grid and one final hash agg.  No self-joins, no grouped Python, no
global windows; the window input is the per-key distinct-value count,
not the raw row count.  The CvM quadratic numerator is accumulated in
DECIMAL(38,0): with per-key sample sizes up to ~10^6 the summands
reach ~10^24, far past BIGINT but well inside 38 digits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tie_grid(df: DataFrame, key: str, value: str, a_flag: Column) -> DataFrame:
    """Collapse rows to the per-key distinct-value grid with per-value
    sample counts and the doubled midrank.

    Returns columns ``(key, value, ca, cb, t, rr)`` where ``ca``/``cb``
    are the two samples' counts at this value, ``t = ca + cb``, and
    ``rr = 2*midrank`` of the tie group (exact BIGINT).
    """
    g = df.groupBy(key, value).agg(
        F.sum(a_flag).alias("ca"),
        F.sum(F.lit(1) - a_flag).alias("cb"),
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (F.col("ca") + F.col("cb")).alias("t")
    return g.select(
        key,
        value,
        "ca",
        "cb",
        t,
        # prev = combined count strictly before this tie group; the tie
        # group occupies combined positions prev+1 .. prev+t, so its
        # midrank is prev + (t+1)/2 and 2*midrank = 2*prev + t + 1.
        (
            2 * (F.sum(F.col("ca") + F.col("cb")).over(wcum) - (F.col("ca") + F.col("cb")))
            + (F.col("ca") + F.col("cb"))
            + 1
        ).alias("rr"),
    )


def mann_whitney(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
) -> DataFrame:
    """Mann–Whitney U test per key between the rows flagged ``is_a``
    and the rest.

    Returns ``(key, n_a, n_b, u2, z)`` where ``u2 = 2*U_A`` is the
    exact integer doubled U statistic (``U_A = R_A - n_a(n_a+1)/2``
    from the midrank sum ``R_A``) and ``z`` is the tie-corrected
    normal score

        z = (U - n_a*n_b/2) / sqrt( (n_a*n_b/12) *
              ( (N+1) - sum(t^3 - t) / (N*(N-1)) ) )

    rounded to 6dp (NULL when the variance is zero or a sample is
    empty).  Ties are midranked; ``sum(t^3 - t)`` is an exact BIGINT.
    """
    a = F.when(F.col(is_a), F.lit(1)).otherwise(F.lit(0))
    grid = _tie_grid(df, key, value, a)
    agg = grid.groupBy(key).agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        # sum over A rows of 2*midrank: each of the ca rows at this
        # value carries the tie group's midrank.
        F.sum(F.col("ca") * F.col("rr")).alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    u2e = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    var = (na * nb / F.lit(12.0)) * (
        (n + 1) - F.col("tie3").cast("double") / (n * (n - 1))
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
        # u2/2 - na*nb/2 == (u2 - na*nb)/2; keep the subtraction on the
        # integer lattice and divide once.
        F.round(
            (u2e - F.col("n_a") * F.col("n_b")).cast("double")
            / (F.lit(2.0) * F.sqrt(var)),
            6,
        ),
    )
    return agg.select(key, "n_a", "n_b", u2e.alias("u2"), z.alias("z")).where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )


def kruskal_wallis(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    grp: str = "grp",
) -> DataFrame:
    """Kruskal–Wallis rank ANOVA per key across the ``grp`` column.

    Returns ``(key, n_obs, n_groups, h)`` with the tie-corrected

        H = [ 12/(N(N+1)) * sum_j R_j^2 / n_j  -  3(N+1) ]
            / ( 1 - sum(t^3 - t) / (N^3 - N) )

    rounded to 6dp (NULL when every value is tied).  Group midrank
    sums are kept doubled (``2*R_j`` exact BIGINT); the division by 4
    is folded into the closed form, so H is a pure function of exact
    integers.

    Two hash aggs + one window: rows collapse to (key, grp, value)
    counts, the midrank grid needs only per-(key, value) totals
    (ranks ignore the group), and the group rank sums come from a join
    of the two small grids on (key, value) — the raw stream is never
    windowed.
    """
    per = df.groupBy(key, grp, value).agg(F.count(F.lit(1)).alias("c"))
    # combined tie grid (group-blind): t per (key, value) and rr =
    # 2*midrank.  _tie_grid counts raw rows, but per already carries
    # multiplicities, so build the grid from the aggregated counts.
    g = per.groupBy(key, value).agg(F.sum("c").alias("t"))
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = g.select(
        key,
        value,
        "t",
        (2 * (F.sum("t").over(wcum) - F.col("t")) + F.col("t") + 1).alias("rr"),
    )
    ranked = per.join(grid, [key, value])
    by_grp = ranked.groupBy(key, grp).agg(
        F.sum("c").alias("n_j"),
        F.sum(F.col("c") * F.col("rr")).alias("r2_j"),
    )
    agg = by_grp.groupBy(key).agg(
        F.sum("n_j").alias("n_obs"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(
            F.col("r2_j").cast("double") * F.col("r2_j").cast("double")
            / F.col("n_j").cast("double")
        ).alias("_sr2"),
    )
    ties = grid.groupBy(key).agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3")
    )
    out = agg.join(ties, key)
    n = F.col("n_obs").cast("double")
    # _sr2 sums (2R_j)^2/n_j, so divide by 4 inside the closed form.
    h_raw = F.lit(12.0) / (n * (n + 1)) * (F.col("_sr2") / F.lit(4.0)) - 3.0 * (n + 1)
    corr = F.lit(1.0) - F.col("tie3").cast("double") / (n * n * n - n)
    h = F.when((F.col("n_groups") > 1) & (corr > 0), F.round(h_raw / corr, 6))
    return out.select(key, "n_obs", "n_groups", h.alias("h"))


def cvm_two_sample(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
) -> DataFrame:
    """Cramér–von Mises two-sample statistic per key.

    The tie-aware computational form over the merged distinct-value
    grid (each distinct value weighted by its combined multiplicity t):

        T = sum_v t_v * (cumA_v * n_b - cumB_v * n_a)^2
            / (N^2 * n_a * n_b),      N = n_a + n_b

    which equals ``(n_a*n_b/N^2) * sum over all N observations of
    (F_A(x) - F_B(x))^2`` — the standard two-sample CvM criterion with
    ECDF steps landing after all tied rows.  The numerator is
    accumulated in DECIMAL(38,0) (summands reach (n_a*n_b)^2 * t), so
    the statistic is a pure function of exact integers; T is rounded
    to 6dp.

    Returns ``(key, n_a, n_b, cvm_t)``.
    """
    a = F.when(F.col(is_a), F.lit(1)).otherwise(F.lit(0))
    g = df.groupBy(key, value).agg(
        F.sum(a).alias("ca"),
        F.sum(F.lit(1) - a).alias("cb"),
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(key)
    cum = g.select(
        key,
        (F.col("ca") + F.col("cb")).alias("t"),
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wtot).alias("n_a"),
        F.sum("cb").over(wtot).alias("n_b"),
    )
    d = (
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).cast("decimal(38,0)")
    agg = cum.groupBy(key).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.col("t").cast("decimal(38,0)") * d * d).alias("_num"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    t_stat = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round(F.col("_num").cast("double") / (n * n * na * nb), 6),
    )
    return agg.select(key, "n_a", "n_b", t_stat.alias("cvm_t")).where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )


def anderson_darling(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    is_a: str = "is_a",
) -> DataFrame:
    """Tie-adjusted two-sample Anderson–Darling A² per key
    (Scholz & Stephens 1987, the midrank A²_akN form with k=2).

    Over the merged distinct-value grid (tie group j of combined size
    ``t_j``, midpoint cumulative ``B_j = C_j - t_j/2``, per-sample
    midpoint cumulative ``M_ij = C_ij - t_ij/2``):

        A² = (N-1)/N * sum_j (t_j/N) * sum_{i in {a,b}} (1/n_i) *
             (N*M_ij - n_i*B_j)² / ( B_j*(N-B_j) - N*t_j/4 )

    The halves are cleared by working on the DOUBLED lattice
    (``d = 2B_j``, ``d_i = 2M_ij`` — exact BIGINT): numerator and
    denominator each pick up a factor 4 that cancels, so every term is
    a ratio of exact integers — the difference ``N*d_i - n_i*d`` stays
    in BIGINT for N up to ~2·10⁹ per key and is squared in
    DECIMAL(38,0).  Per-group terms divide once to double and sum; A²
    is rounded to 6dp.  Groups with zero denominator (only the
    everything-tied degenerate grid) yield NULL.

    Same scale shape as the siblings: one hash agg to the per-key
    distinct-value grid, one key-partitioned cumulative window over
    that grid, one final hash agg — no self-joins, no Python.

    Returns ``(key, n_a, n_b, a2)``.
    """
    a = F.when(F.col(is_a), F.lit(1)).otherwise(F.lit(0))
    g = df.groupBy(key, value).agg(
        F.sum(a).alias("ca"),
        F.sum(F.lit(1) - a).alias("cb"),
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(key)
    cum = g.select(
        key,
        (F.col("ca") + F.col("cb")).alias("t"),
        # doubled midpoint cumulatives: d = 2*C - t (combined), and per
        # sample d_a = 2*C_a - c_a, d_b = 2*C_b - c_b.
        (2 * F.sum(F.col("ca") + F.col("cb")).over(wcum) - (F.col("ca") + F.col("cb"))).alias("d"),
        (2 * F.sum("ca").over(wcum) - F.col("ca")).alias("da"),
        (2 * F.sum("cb").over(wcum) - F.col("cb")).alias("db"),
        F.sum("ca").over(wtot).alias("n_a"),
        F.sum("cb").over(wtot).alias("n_b"),
    )
    n_tot = F.col("n_a") + F.col("n_b")
    # denominator on the doubled lattice: 4*(B(N-B) - N*t/4)
    #   = d*(2N - d) - N*t  (exact BIGINT, > 0 unless t = N)
    den = F.col("d") * (2 * n_tot - F.col("d")) - n_tot * F.col("t")
    diff_a = (n_tot * F.col("da") - F.col("n_a") * F.col("d")).cast("decimal(38,0)")
    diff_b = (n_tot * F.col("db") - F.col("n_b") * F.col("d")).cast("decimal(38,0)")
    term = F.when(
        den > 0,
        F.col("t").cast("double")
        * (
            (diff_a * diff_a).cast("double") / F.col("n_a").cast("double")
            + (diff_b * diff_b).cast("double") / F.col("n_b").cast("double")
        )
        / (n_tot.cast("double") * den.cast("double")),
    )
    agg = cum.groupBy(key).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(term).alias("_s"),
        F.sum(F.when(den <= 0, 1).otherwise(0)).alias("_degen"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    a2 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("_degen") == 0),
        F.round((n - 1) / n * F.col("_s"), 6),
    )
    return agg.select(key, "n_a", "n_b", a2.alias("a2")).where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )


def dunn_posthoc(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    grp: str = "grp",
    min_each: int = 5,
) -> DataFrame:
    """Dunn's (1964) post-hoc pairwise z tests on kruskal_wallis's
    exact lattice — KW's H says "SOME group differs"; this says
    WHICH pairs do, with the tie-corrected pooled variance

        z_jk = (Rbar_j - Rbar_k)
               / sqrt[(N(N+1)/12 - T3/(12(N-1))) (1/n_j + 1/n_k)]

    (T3 = sum(t^3 - t) over the combined tie grid).  Mean ranks come
    from the DOUBLED midrank sums (Rbar = r2/(2n)), so the numerator
    is one fixed rational tree over exact BIGINTs and z is one double
    tree, round 6, signed zero normalized.  Pairs are built by a
    per-key self-join of the (key, grp) aggregate frame (grp_a <
    grp_b; at most C(G,2) rows per key, G = group-alphabet size) —
    both sides per-key aggregates, broadcast-eligible at any scale.
    The degenerate all-tied variance emits NULL z.

    Returns (key, grp_a, grp_b, n_a, n_b, r2_a, r2_b, dunn_z); group
    pairs where either side is under ``min_each`` drop.
    """
    # r06: per/grid/by_grp are each referenced by 2+ downstream
    # branches (a/b self-join sides, the tie-total reduction); without
    # persist the raw scan + lattice chain re-executed five times in
    # one plan (guide §2.4; all three frames are bounded aggregates —
    # |key x grp x value|, |key x value|, |key x grp| rows).
    per = df.groupBy(key, grp, value).agg(F.count(F.lit(1)).alias("c")).persist()
    g = per.groupBy(key, value).agg(F.sum("c").alias("t"))
    wcum = (
        Window.partitionBy(key)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = g.select(
        key,
        value,
        "t",
        (2 * (F.sum("t").over(wcum) - F.col("t")) + F.col("t") + 1).alias(
            "rr"
        ),
    ).persist()
    by_grp = (
        per.join(grid, [key, value])
        .groupBy(key, grp)
        .agg(
            F.sum("c").alias("n_j"),
            F.sum(F.col("c") * F.col("rr")).alias("r2_j"),
        )
    ).persist()
    tot = grid.groupBy(key).agg(
        F.sum("t").alias("n_obs"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    a = by_grp.select(
        F.col(key).alias("key"),
        F.col(grp).alias("grp_a"),
        F.col("n_j").alias("n_a"),
        F.col("r2_j").alias("r2_a"),
    )
    b = by_grp.select(
        F.col(key).alias("key"),
        F.col(grp).alias("grp_b"),
        F.col("n_j").alias("n_b"),
        F.col("r2_j").alias("r2_b"),
    )
    pairs = (
        a.join(b, "key")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .filter(
            (F.col("n_a") >= int(min_each)) & (F.col("n_b") >= int(min_each))
        )
        .join(tot.withColumnRenamed(key, "key"), "key")
    )
    n = F.col("n_obs").cast("double")
    varp = (
        n * (n + 1) / F.lit(12.0)
        - F.col("tie3").cast("double")
        / (F.lit(12.0) * (n - F.lit(1.0)))
    )
    dmean = (
        F.col("r2_a").cast("double") / F.col("n_a").cast("double")
        - F.col("r2_b").cast("double") / F.col("n_b").cast("double")
    ) / F.lit(2.0)
    se = F.sqrt(
        varp
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(varp > 0, F.round(dmean / se, 6) + F.lit(0.0))
    return pairs.select(
        "key",
        "grp_a",
        "grp_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("r2_a").cast("long").alias("r2_a"),
        F.col("r2_b").cast("long").alias("r2_b"),
        z.alias("dunn_z"),
    )
