"""One-way ANOVA F and Brown-Forsythe variance-homogeneity tests per
key over the balanced complete-week weekday design — the PARAMETRIC
partners of friedman (blocked ranks) and kruskal_wallis (pooled
ranks): does the weekday shift a key's activity LEVEL, and does it
shift its SPREAD? (Fisher 1925; Brown & Forsythe 1974 / Levene 1960
with the median center, public formulae.)

Both ride :func:`tits_spark.operators.friedman.weekday_cells` — daily
event counts, zero-filled, complete weeks only — so every weekday
group has EXACTLY n observations (n = complete weeks). Balance is a
construction, not an assumption, and it makes the cleared one-way
algebra exact: with k = 7 groups, group sums S_j, U = sum_j S_j^2,
grand total T = sum_j S_j and raw square sum Q = sum x^2,

    SSB = (7U - T^2) / (7n)        SSW = (nQ - U) / n

        F = (n-1) * (7U - T^2) / ( 6 * (nQ - U) )
     eta2 = (7U - T^2) / (7nQ - T^2)

— numerator and denominator are EXACT integers (one double division
each), because every n_j equals n so no per-group /n_j survives the
clearing. Unbalanced daily data never reaches this formula: the
zero-fill completes interior weeks and the filter drops boundary
part-weeks, exactly as friedman does.

Brown-Forsythe is the SAME cleared one-way F applied to the doubled
absolute deviations z = |2x - m2_j| where m2_j is the DOUBLED group
median (the sum of the two middle order statistics — an exact
integer even when the median itself is a half-integer; the constant
factor 2 cancels inside F). The median center (vs Levene's mean) is
what makes the test robust to the heavy tails daily counts actually
have, and it keeps the lattice integer: a mean center would put a
rational on every row.

Exactness: U, T, Q (and their z-counterparts) accumulate in
decimal(38,0) and are emitted as BIGINT — int64-exact while
n * C_day^2 * 7n < 2^63 (C_day = max daily count; ~10^3 weeks at
10^6-events/day keys before the envelope matters — far above any real
key-span; past it, the decimal(38,0) internals stay exact and only
the emission cast would need widening, cf. kpss.py's envelope note).
F and eta2 are one fixed double tree over those exact integers
(round 6; NULL when the denominator is 0 — all-equal-within-groups
for F, an all-constant key for eta2).

Plan shape: ONE raw scan -> the (key, day) partial aggregate (10^12
turns collapse to key-days before anything else) -> the bounded gap
explode -> for ANOVA one (key, trt) + one (key) hash aggregate; for
Brown-Forsythe one extra (key, trt) window pair (rank + median pick)
riding the SAME exchange as the group aggregate. No join, no UDF,
no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.friedman import K, weekday_cells

DEC = "decimal(38,0)"


def _balanced_oneway(cells: DataFrame, min_blocks: int) -> DataFrame:
    """Cleared balanced one-way F + eta2 over (key, trt, c) cells.

    Emits (key, n_blocks, u, t, q, f_stat, eta2); u/t/q are the exact
    integer sufficient statistics (sum_j S_j^2, grand total, raw
    square sum)."""
    per_trt = cells.groupBy("key", "trt").agg(
        F.sum(F.col("c").cast(DEC)).alias("sj"),
        F.sum((F.col("c").cast(DEC) * F.col("c"))).alias("qj"),
        F.count(F.lit(1)).alias("nj"),
    )
    per_key = (
        per_trt.groupBy("key")
        .agg(
            F.max("nj").alias("n_blocks"),
            F.sum(F.col("sj") * F.col("sj")).alias("_u"),
            F.sum("sj").alias("_t"),
            F.sum("qj").alias("_q"),
        )
        .filter(F.col("n_blocks") >= int(min_blocks))
    )
    n = F.col("n_blocks").cast(DEC)
    ssb_num = F.lit(K) * F.col("_u") - F.col("_t") * F.col("_t")  # 7U - T^2
    ssw_num = n * F.col("_q") - F.col("_u")                       # nQ - U
    sst_num = F.lit(K) * n * F.col("_q") - F.col("_t") * F.col("_t")
    f_stat = F.when(
        ssw_num > 0,
        F.round(
            ((n - 1) * ssb_num).cast("double")
            / (F.lit(K - 1) * ssw_num).cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    eta2 = F.when(
        sst_num > 0,
        F.round(ssb_num.cast("double") / sst_num.cast("double"), 6)
        + F.lit(0.0),
    )
    return per_key.select(
        "key",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("_u").cast("long").alias("u"),
        F.col("_t").cast("long").alias("t"),
        F.col("_q").cast("long").alias("q"),
        f_stat.alias("f_stat"),
        eta2.alias("eta2"),
    )


def anova_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 2,
) -> DataFrame:
    """Per-key one-way ANOVA F of weekday effect on daily event counts
    over complete weeks (balanced by construction).

    Returns (key, n_blocks, u, t, q, f_stat, eta2): the exact integer
    sufficient statistics, the F statistic on (6, 7(n-1)) degrees of
    freedom and the eta-squared effect size (round 6; NULL when the
    within-group variance, resp. the total variance, is zero)."""
    return _balanced_oneway(
        weekday_cells(df, key=key, ts=ts), min_blocks=min_blocks
    )


def brown_forsythe_weekday(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_blocks: int = 3,
) -> DataFrame:
    """Per-key Brown-Forsythe test: does the SPREAD of daily activity
    differ by weekday? The balanced one-way F applied to the doubled
    absolute deviations from each weekday's doubled median (exact
    integers; the 2x cancels in F).

    Returns (key, n_blocks, u, t, q, f_stat, eta2) over the deviation
    lattice; f_stat is NULL when every deviation is group-constant.
    ``min_blocks`` defaults to 3: with n = 2 every |x - median| pair
    is symmetric and the within-group variance collapses."""
    cells = weekday_cells(df, key=key, ts=ts)
    wg = Window.partitionBy("key", "trt")
    # deterministic median pick: order by (c, blk); ties on c make the
    # blk tiebreak irrelevant to the VALUE of the middle order stats
    wr = Window.partitionBy("key", "trt").orderBy("c", "blk")
    ranked = cells.withColumn("rn", F.row_number().over(wr)).withColumn(
        "ng", F.count(F.lit(1)).over(wg)
    )
    # middle order-statistic ranks: lo = floor((n+1)/2), hi = floor((n+2)/2)
    lo = F.floor((F.col("ng") + 1) / 2).cast("long")
    hi = F.floor((F.col("ng") + 2) / 2).cast("long")
    m2 = F.sum(
        F.when(F.col("rn") == lo, F.col("c")).otherwise(F.lit(0))
        + F.when(F.col("rn") == hi, F.col("c")).otherwise(F.lit(0))
    ).over(wg)
    dev = ranked.select(
        "key",
        "trt",
        F.abs(2 * F.col("c") - m2).alias("c"),
    )
    return _balanced_oneway(dev, min_blocks=min_blocks)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def welch_anova_types(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    grp: str = "grp",
    groups: tuple = EVENT_TYPES,
    min_each: int = 5,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA per key across a FIXED,
    known group alphabet (Welch, Biometrika 1951) — the k-group
    companion of effect_size.welch_t, and the variance-robust
    alternative to this module's classical F (which assumes equal
    group variances; anova_weekday gets that by balanced design,
    but across EVENT TYPES neither balance nor homoscedasticity
    holds).  With w_j = n_j/v_j, mw = sum w_j m_j / sum w_j and
    h_j = (1 - w_j/sum w)^2/(n_j - 1):

        F*  = [sum_j w_j (m_j - mw)^2 / (k-1)]
              / [1 + 2(k-2)/(k^2-1) * sum h_j]
        df2 = (k^2 - 1) / (3 sum h_j)

    Exactness device: the per-group moments PIVOT into fixed columns
    (the group alphabet is known and closed), so every cross-group
    sum is a FIXED-ORDER expression tree over k columns — no
    aggregation order exists to diverge, unlike a groupBy-reduce of
    per-group doubles.  Moments are exact cents integers; outputs
    round 6, signed zero normalized.

    Plan: one (key, grp) hash agg -> one pivot hash agg -> fixed
    trees.  No window, no join, no Python.

    Returns (key, n_total, welch_f, welch_df2); keys missing any
    group, with any group under ``min_each`` rows, or with a
    zero-variance group drop (Welch's w = n/v is undefined there).
    """
    DEC = "decimal(38,0)"
    c = F.round(F.col(value) * 100).cast("long")
    per = (
        df.select(F.col(key).alias("key"), F.col(grp).alias("g"), c.alias("c"))
        .groupBy("key", "g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c").cast(DEC) * F.col("c")).alias("s2"),
        )
    )
    piv = (
        per.groupBy("key")
        .pivot("g", list(groups))
        .agg(
            F.first("n").alias("n"),
            F.first("s1").alias("s1"),
            F.first("s2").alias("s2"),
        )
    )
    k = len(groups)
    cond = F.lit(True)
    for g in groups:
        cond = cond & (F.coalesce(F.col(f"{g}_n"), F.lit(0)) >= int(min_each))
    piv = piv.filter(cond)

    # layered projections instead of one closed-form tree: the nested
    # w(g)/m(g)/mw closures re-embed their whole subtree at every use,
    # so the single-select form builds a multi-thousand-node Column
    # tree (measured ~1.1 s of py4j/analysis per call — more than the
    # query's execution). Each layer aliases a subtree once and later
    # layers reference the alias; every output's operation tree (and
    # IEEE evaluation order) is unchanged, the nodes are just shared.
    def m(g):
        return F.col(f"{g}_s1").cast("double") / F.col(f"{g}_n").cast(
            "double"
        )

    def v(g):
        n = F.col(f"{g}_n").cast("double")
        s1 = F.col(f"{g}_s1").cast("double")
        s2 = F.col(f"{g}_s2").cast("double")
        return (n * s2 - s1 * s1) / (n * (n - F.lit(1.0)))

    vpos = F.lit(True)
    for g in groups:
        vpos = vpos & (v(g) > 0)
    piv = piv.filter(vpos)

    ntot = F.col(f"{groups[0]}_n")
    for g in groups[1:]:
        ntot = ntot + F.col(f"{g}_n")
    l1 = piv.select(
        "key",
        ntot.cast("long").alias("n_total"),
        *[F.col(f"{g}_n").cast("double").alias(f"{g}_nd") for g in groups],
        *[m(g).alias(f"{g}_m") for g in groups],
        *[(F.col(f"{g}_n").cast("double") / v(g)).alias(f"{g}_w") for g in groups],
    )
    sw = F.col(f"{groups[0]}_w")
    swm = F.col(f"{groups[0]}_w") * F.col(f"{groups[0]}_m")
    for g in groups[1:]:
        sw = sw + F.col(f"{g}_w")
        swm = swm + F.col(f"{g}_w") * F.col(f"{g}_m")
    l2 = l1.select("*", sw.alias("_sw"), (swm / sw).alias("_mw"))

    def aterm(g):
        d = F.col(f"{g}_m") - F.col("_mw")
        return F.col(f"{g}_w") * (d * d)

    def h(g):
        t = F.lit(1.0) - F.col(f"{g}_w") / F.col("_sw")
        return (t * t) / (F.col(f"{g}_nd") - F.lit(1.0))

    a = aterm(groups[0])
    hh = h(groups[0])
    for g in groups[1:]:
        a = a + aterm(g)
        hh = hh + h(g)
    l3 = l2.select("key", "n_total", a.alias("_a"), hh.alias("_hh"))
    fstar = (F.col("_a") / F.lit(float(k - 1))) / (
        F.lit(1.0)
        + F.lit(2.0 * (k - 2) / (k * k - 1.0)) * F.col("_hh")
    )
    df2 = F.lit(float(k * k - 1)) / (F.lit(3.0) * F.col("_hh"))
    return l3.select(
        "key",
        "n_total",
        (F.round(fstar, 6) + F.lit(0.0)).alias("welch_f"),
        (F.round(df2, 6) + F.lit(0.0)).alias("welch_df2"),
    )


def fligner_killeen_types(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    grp: str = "grp",
    groups: tuple = EVENT_TYPES,
    min_each: int = 5,
) -> DataFrame:
    """Fligner–Killeen normal-scores k-group scale test per key
    (Fligner & Killeen, JASA 1976; the median-centered chi-square
    form of Conover, Johnson & Johnson 1981) across the CLOSED group
    alphabet — the robust k-GROUP spread test (welch_anova moves
    means; this asks whether the event types differ in VALUE
    DISPERSION, robust to non-normality where Bartlett's test
    collapses).

        a_i = Phi^-1(1/2 + r_i / (2(N+1))),  r_i = pooled midrank of
              |x_ij - median_j|
        FK  = sum_j n_j (abar_j - abar)^2 / V,
        V   = (sum a^2 - N abar^2) / (N - 1)        ~ chi2(k-1)

    Devices (all established): per-group DOUBLED medians m2_j from
    the group tie grid (the brown_forsythe order-statistic pick, made
    unbalanced-safe), integer deviation lattice d = |2c - m2_j|,
    pooled doubled midranks rr on the (key, d) grid, the shared
    Acklam probit tree (:func:`normality._probit` /
    ``normality.probit_sql``) at p = 1/2 + rr/(4(N+1)), per-cell
    score masses ppb-FLOORED (floor(1e9 * t * a), the logrank grain)
    so group/key sums are exact BIGINTs, and the cross-group
    reduction PIVOTED to fixed columns (the welch_anova device).
    FK and V are fixed double trees, round 6; a zero V (all
    deviations tied) emits NULL.

    Plan: group tie grid -> ONE (key, grp)-window chain (cumulative +
    totals share the sort) -> median pick agg joined back (per-group
    aggregate) -> pooled (key, d) grid -> ONE (key)-window chain ->
    equi-join back to group cells -> ppb hash agg -> pivot -> trees.
    No cartesian, no Python.

    Returns (key, n_total, fk_stat, fk_df)."""
    from tits_spark.operators.normality import _probit

    c = F.round(F.col(value) * 100).cast("long")
    base = df.select(
        F.col(key).alias("key"), F.col(grp).alias("g"), c.alias("c")
    )
    gg = base.groupBy("key", "g", "c").agg(F.count(F.lit(1)).alias("t"))
    wg = (
        Window.partitionBy("key", "g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wga = Window.partitionBy("key", "g")
    gcum = gg.select(
        "key",
        "g",
        "c",
        "t",
        F.sum("t").over(wg).alias("b"),
        F.sum("t").over(wga).alias("n"),
    )
    p1 = F.floor((F.col("n") + 1) / 2).cast("long")
    p2 = F.floor(F.col("n") / 2).cast("long") + 1
    a_ = F.col("b") - F.col("t")
    med = (
        gcum.groupBy("key", "g")
        .agg(
            F.max("n").alias("n_g"),
            F.sum(
                F.col("c")
                * (
                    ((a_ < p1) & (p1 <= F.col("b"))).cast("long")
                    + ((a_ < p2) & (p2 <= F.col("b"))).cast("long")
                )
            ).alias("m2"),
        )
        .filter(F.col("n_g") >= int(min_each))
    )
    dev = (
        gg.join(med, ["key", "g"])
        .select(
            "key",
            "g",
            F.abs(2 * F.col("c") - F.col("m2")).alias("d"),
            "t",
        )
        .groupBy("key", "g", "d")
        .agg(F.sum("t").alias("t"))
    )
    pooled = dev.groupBy("key", "d").agg(F.sum("t").alias("pt"))
    wp = (
        Window.partitionBy("key")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wpa = Window.partitionBy("key")
    pgrid = pooled.select(
        "key",
        "d",
        (
            2 * (F.sum("pt").over(wp) - F.col("pt")) + F.col("pt") + 1
        ).alias("rr"),
        F.sum("pt").over(wpa).alias("nn"),
    )
    cells = dev.join(pgrid, ["key", "d"])
    p = F.lit(0.5) + F.col("rr").cast("double") / (
        F.lit(4.0) * (F.col("nn").cast("double") + F.lit(1.0))
    )
    av = _probit(p)
    qa = F.floor(F.lit(1e9) * (F.col("t").cast("double") * av)).cast("long")
    qq = F.floor(
        F.lit(1e9) * (F.col("t").cast("double") * (av * av))
    ).cast("long")
    per_g = cells.groupBy("key", "g").agg(
        F.sum("t").cast("long").alias("n_j"),
        F.sum(qa).alias("a_j"),
        F.sum(qq).alias("q_j"),
    )
    # q_k rides the SAME per-(key, g) aggregate as n_j/a_j and is
    # re-summed from the pivot columns: the alphabet is closed (the
    # operator's documented contract), so the per-group BIGINT sums
    # add to the identical exact total — the old separate
    # cells.groupBy("key") aggregate re-executed the whole upstream
    # join/window chain a second time (guide §2.4).
    piv = (
        per_g.groupBy("key")
        .pivot("g", list(groups))
        .agg(
            F.first("n_j").alias("n"),
            F.first("a_j").alias("a"),
            F.first("q_j").alias("q"),
        )
    )
    cond = F.lit(True)
    for g in groups:
        cond = cond & F.col(f"{g}_n").isNotNull()
    piv = piv.filter(cond)
    q_k = F.col(f"{groups[0]}_q")
    for g in groups[1:]:
        q_k = q_k + F.col(f"{g}_q")
    piv = piv.withColumn("q_k", q_k)
    k = len(groups)
    ntot = F.col(f"{groups[0]}_n")
    for g in groups[1:]:
        ntot = ntot + F.col(f"{g}_n")
    atot = F.col(f"{groups[0]}_a")
    for g in groups[1:]:
        atot = atot + F.col(f"{g}_a")
    nd = ntot.cast("double")
    abar = (atot.cast("double") / F.lit(1e9)) / nd

    def term(g):
        aj = (F.col(f"{g}_a").cast("double") / F.lit(1e9)) / F.col(
            f"{g}_n"
        ).cast("double")
        return F.col(f"{g}_n").cast("double") * ((aj - abar) * (aj - abar))

    num = term(groups[0])
    for g in groups[1:]:
        num = num + term(g)
    vv = (
        F.col("q_k").cast("double") / F.lit(1e9) - nd * (abar * abar)
    ) / (nd - F.lit(1.0))
    fk = F.when(vv > 0, F.round(num / vv, 6) + F.lit(0.0))
    return piv.select(
        "key",
        ntot.cast("long").alias("n_total"),
        fk.alias("fk_stat"),
        F.lit(k - 1).cast("long").alias("fk_df"),
    )
