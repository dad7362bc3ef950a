"""Two-sample log-rank (Mantel-Cox 1966/1972) test per entry cohort —
do morning-entry and afternoon-entry users convert at the same RATE
over time, censoring handled correctly? The hypothesis-test companion
of survival.kaplan_meier (which draws the two curves but does not
score their separation); the equality-of-hazards question a funnel
dashboard actually wants answered.

Subjects, durations and censoring are kaplan_meier's exactly (entry =
first start_event, failure = first end_event at-or-after entry,
censor at last observed event, exact integer microsecond durations);
the two arms split on the entry hour (AM vs PM). At each distinct
failure time t in the pooled per-cohort grid, with d_t total deaths,
n1t/n2t at risk and nt = n1t + n2t:

    O1 = sum d1t                                (exact BIGINT)
    E1 = sum d_t * n1t / nt
    V  = sum d_t * (n1t/nt) * (n2t/nt) * (nt - d_t) / (nt - 1)

    chi2 = (O1 - E1)^2 / V        ~ chi2(1) under equal hazards.

Exactness: E1 and V are per-time rationals, so their naive double
sums would be partial-order-dependent. They are instead QUANTIZED
per time onto integer lattices before summation (the moran/staleness
floor device): e1q_t = floor(1e9 * d*n1/n) and vq_t = floor(1e6 *
d*n1*n2*(n-d) / (n^2*(n-1))), each floor taken over the identical
double tree on both engines (numerators/denominators are exact
decimal integers first; the hac floor precedent); the sums are then
exact DECIMAL(38,0). A 1e-9/1e-6 term grain is 3+ orders below any
chi-square decision boundary. chi2 is one fixed double tree over
(O1, sum e1q, sum vq), round 6.

Plan shape (100 TB): one (key)-window for entry, one hash agg to
subjects, one hash agg to the per-cohort pooled duration grid, then
cohort-partitioned cumulative windows over the grid (distinct
durations, never raw rows — survival.py's shape) and one final
cohort agg. No joins, no Python, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def logrank_ampm(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    start_event: str = "view",
    end_event: str = "purchase",
    cohort_fmt: str = "yyyy-MM",
) -> DataFrame:
    """Per-cohort log-rank test of AM-entry vs PM-entry conversion.

    Returns (cohort, n1, n2, o1, o2, e1q, vq, chi2): arm sizes, exact
    observed death counts, the quantized expected/variance lattice
    sums, and the Mantel-Cox chi-square (round 6; NULL when V = 0 —
    e.g. a cohort with an empty arm)."""
    wk = Window.partitionBy("_k")
    e = df.select(
        F.col(key).alias("_k"),
        epoch_us(ts).alias("_u"),
        F.col(event_col).alias("_et"),
    )
    e = e.withColumn(
        "_fv", F.min(F.when(F.col("_et") == start_event, F.col("_u"))).over(wk)
    ).where(F.col("_fv").isNotNull())
    subj = e.groupBy("_k", "_fv").agg(
        F.min(
            F.when(
                (F.col("_et") == end_event) & (F.col("_u") >= F.col("_fv")),
                F.col("_u"),
            )
        ).alias("_lp"),
        F.max("_u").alias("_le"),
    )
    subj = subj.select(
        F.date_format(
            F.timestamp_micros(F.col("_fv")), cohort_fmt
        ).alias("cohort"),
        (F.hour(F.timestamp_micros(F.col("_fv"))) < 12).alias("_am"),
        F.when(F.col("_lp").isNotNull(), F.col("_lp") - F.col("_fv"))
        .otherwise(F.col("_le") - F.col("_fv"))
        .alias("dur_us"),
        F.when(F.col("_lp").isNotNull(), 1).otherwise(0).alias("_evt"),
    )
    one = F.lit(1)
    grid = subj.groupBy("cohort", "dur_us").agg(
        F.sum(F.when(F.col("_am"), F.col("_evt")).otherwise(0)).alias("d1"),
        F.sum(F.when(~F.col("_am"), F.col("_evt")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("_am"), one - F.col("_evt")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(~F.col("_am"), one - F.col("_evt")).otherwise(0)).alias(
            "c2"
        ),
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("cohort")

    def _risk(dc: F.Column, cc: F.Column) -> F.Column:
        tot = F.sum(dc + cc).over(wtot)
        cum = F.sum(dc + cc).over(wcum)
        return tot - cum + (dc + cc)

    r = grid.select(
        "cohort",
        "d1",
        "d2",
        _risk(F.col("d1"), F.col("c1")).alias("n1t"),
        _risk(F.col("d2"), F.col("c2")).alias("n2t"),
        F.sum(F.col("d1") + F.col("c1")).over(wtot).alias("n1"),
        F.sum(F.col("d2") + F.col("c2")).over(wtot).alias("n2"),
    )
    d = (F.col("d1") + F.col("d2")).cast("long")
    nt = (F.col("n1t") + F.col("n2t")).cast("long")
    has = (d > 0) & (nt > 1)
    # cast to decimal BEFORE the products: d*n1t*n2t*(nt-d) wraps
    # int64 already at ~1e5 deaths x 1e5 at risk
    e1q = F.when(
        has,
        F.floor(
            F.lit(1e9)
            * (
                (d.cast(DEC) * F.col("n1t")).cast("double")
                / nt.cast("double")
            )
        ),
    ).otherwise(F.lit(0)).cast(DEC)
    v_num = (
        d.cast(DEC) * F.col("n1t") * F.col("n2t") * (nt - d)
    ).cast(DEC)
    v_den = (nt.cast(DEC) * nt * (nt - 1)).cast(DEC)
    vq = F.when(
        has,
        F.floor(
            F.lit(1e6) * (v_num.cast("double") / v_den.cast("double"))
        ),
    ).otherwise(F.lit(0)).cast(DEC)
    agg = r.groupBy("cohort").agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d2").cast("long").alias("o2"),
        F.sum(e1q).alias("e1q"),
        F.sum(vq).alias("vq"),
    )
    e1 = F.col("e1q").cast("double") / F.lit(1e9)
    v = F.col("vq").cast("double") / F.lit(1e6)
    diff = F.col("o1").cast("double") - e1
    chi2 = F.when(
        F.col("vq") > 0, F.round(diff * diff / v, 6) + F.lit(0.0)
    )
    return agg.select(
        "cohort",
        "n1",
        "n2",
        "o1",
        "o2",
        F.col("e1q").cast("long").alias("e1q"),
        F.col("vq").cast("long").alias("vq"),
        chi2.alias("chi2"),
    )


def gehan_ampm(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    start_event: str = "view",
    end_event: str = "purchase",
    cohort_fmt: str = "yyyy-MM",
) -> DataFrame:
    """Gehan–Breslow generalized Wilcoxon test per cohort (Gehan,
    Biometrika 1965; Breslow 1970) — :func:`logrank_ampm` with weight
    w_t = n_t, the at-risk count: EARLY hazard differences dominate,
    where the unweighted logrank dilutes them across the whole curve.
    The standard companion pair every survival package ships.

    The weighting IMPROVES the exactness story: with w = n_t the
    expected-count term clears completely —

        O1w = sum n_t * d1t          (exact integer)
        E1w = sum d_t * n1t          (exact integer; the /n_t cancels)
        Vw  = sum d_t n1t n2t (n_t - d_t) / (n_t - 1)

    so only Vw needs the 1e6 floor lattice (logrank's grain) and the
    O-E difference is EXACT decimal arithmetic.  chi2 is one double
    tree, round 6; V = 0 emits NULL.

    Same plan as logrank_ampm: entry window, subject agg, pooled
    duration grid, cohort-cumulative windows on the grid, one final
    agg.  Returns (cohort, n1, n2, o1w, e1w, vq, chi2)."""
    wk = Window.partitionBy("_k")
    e = df.select(
        F.col(key).alias("_k"),
        epoch_us(ts).alias("_u"),
        F.col(event_col).alias("_et"),
    )
    e = e.withColumn(
        "_fv", F.min(F.when(F.col("_et") == start_event, F.col("_u"))).over(wk)
    ).where(F.col("_fv").isNotNull())
    subj = e.groupBy("_k", "_fv").agg(
        F.min(
            F.when(
                (F.col("_et") == end_event) & (F.col("_u") >= F.col("_fv")),
                F.col("_u"),
            )
        ).alias("_lp"),
        F.max("_u").alias("_le"),
    )
    subj = subj.select(
        F.date_format(
            F.timestamp_micros(F.col("_fv")), cohort_fmt
        ).alias("cohort"),
        (F.hour(F.timestamp_micros(F.col("_fv"))) < 12).alias("_am"),
        F.when(F.col("_lp").isNotNull(), F.col("_lp") - F.col("_fv"))
        .otherwise(F.col("_le") - F.col("_fv"))
        .alias("dur_us"),
        F.when(F.col("_lp").isNotNull(), 1).otherwise(0).alias("_evt"),
    )
    one = F.lit(1)
    grid = subj.groupBy("cohort", "dur_us").agg(
        F.sum(F.when(F.col("_am"), F.col("_evt")).otherwise(0)).alias("d1"),
        F.sum(F.when(~F.col("_am"), F.col("_evt")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("_am"), one - F.col("_evt")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(~F.col("_am"), one - F.col("_evt")).otherwise(0)).alias(
            "c2"
        ),
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("cohort")

    def _risk(dc, cc):
        tot = F.sum(dc + cc).over(wtot)
        cum = F.sum(dc + cc).over(wcum)
        return tot - cum + (dc + cc)

    r = grid.select(
        "cohort",
        "d1",
        "d2",
        _risk(F.col("d1"), F.col("c1")).alias("n1t"),
        _risk(F.col("d2"), F.col("c2")).alias("n2t"),
        F.sum(F.col("d1") + F.col("c1")).over(wtot).alias("n1"),
        F.sum(F.col("d2") + F.col("c2")).over(wtot).alias("n2"),
    )
    d = (F.col("d1") + F.col("d2")).cast("long")
    nt = (F.col("n1t") + F.col("n2t")).cast("long")
    has = (d > 0) & (nt > 1)
    o1w = F.when(has, (nt.cast(DEC) * F.col("d1")).cast(DEC)).otherwise(
        F.lit(0).cast(DEC)
    )
    e1w = F.when(has, (d.cast(DEC) * F.col("n1t")).cast(DEC)).otherwise(
        F.lit(0).cast(DEC)
    )
    v_num = (
        d.cast(DEC) * F.col("n1t") * F.col("n2t") * (nt - d)
    ).cast(DEC)
    vq = F.when(
        has,
        F.floor(
            F.lit(1e6)
            * (v_num.cast("double") / (nt - 1).cast("double"))
        ),
    ).otherwise(F.lit(0)).cast(DEC)
    agg = r.groupBy("cohort").agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum(o1w).alias("_o"),
        F.sum(e1w).alias("_e"),
        F.sum(vq).alias("vq"),
    )
    diff = (F.col("_o") - F.col("_e")).cast(DEC)
    v = F.col("vq").cast("double") / F.lit(1e6)
    chi2 = F.when(
        F.col("vq") > 0,
        F.round(
            diff.cast("double") * diff.cast("double") / v, 6
        )
        + F.lit(0.0),
    )
    return agg.select(
        "cohort",
        "n1",
        "n2",
        F.col("_o").cast("long").alias("o1w"),
        F.col("_e").cast("long").alias("e1w"),
        F.col("vq").cast("long").alias("vq"),
        chi2.alias("chi2"),
    )
