"""Kaplan–Meier survival estimation over event streams, declarative.

The time-to-event question a funnel pipeline can't answer with plain
conversion counts: "of the users who started (first ``start_event``),
what FRACTION is still unconverted after time t, given that users we
stopped observing are censored, not failed?"  Kaplan & Meier (1958)
product-limit estimator; right-censoring at each subject's last
observed event.  This extends the conversion family
(events_analytics.funnel, time_to_conv) with the censoring-correct
curve — time_to_conv's quantiles silently condition on conversion,
which overstates speed whenever observation windows differ.

Per subject: entry = first ``start_event`` timestamp, failure = first
``end_event`` AT OR AFTER entry, censor = last observed event.
Durations are exact integer MICROSECONDS (epoch_us), so the grid,
at-risk counts and event counts are all exact integers; the only
floating step is the product-limit itself, computed as
``exp(cumsum(ln(1 - d/n)))`` — the identical op tree on both engines —
and rounded to 6dp.  A tie group where everyone at risk fails
(``d = n_risk``, only possible at a cohort's last time) pins the curve
to exactly 0 instead of feeding ln(0).

Scale shape: one key-partitioned window over the raw events (entry
time), one hash agg to subjects, one hash agg to the per-cohort
distinct-duration grid, and cohort-partitioned cumulative windows over
that grid — the windows run on the grid (distinct durations), never
the raw stream.  No joins, no Python, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def _risk_grid(
    df: DataFrame,
    key: str,
    ts: str,
    event_col: str,
    start_event: str,
    end_event: str,
    cohort_fmt: str,
) -> DataFrame:
    """Shared risk-set grid for the survival estimators: one row per
    (cohort, distinct duration) with exact integer ``d``, ``censored``
    and ``n_risk`` (see `kaplan_meier` for the subject definitions)."""
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
        F.date_format(F.timestamp_micros(F.col("_fv")), cohort_fmt).alias("cohort"),
        F.when(F.col("_lp").isNotNull(), F.col("_lp") - F.col("_fv"))
        .otherwise(F.col("_le") - F.col("_fv"))
        .alias("dur_us"),
        F.when(F.col("_lp").isNotNull(), 1).otherwise(0).alias("_evt"),
    )
    grid = subj.groupBy("cohort", "dur_us").agg(
        F.sum("_evt").alias("d"),
        F.sum(F.lit(1) - F.col("_evt")).alias("censored"),
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("cohort")
    return grid.select(
        "cohort",
        "dur_us",
        "d",
        "censored",
        (
            F.sum(F.col("d") + F.col("censored")).over(wtot)
            - F.sum(F.col("d") + F.col("censored")).over(wcum)
            + (F.col("d") + F.col("censored"))
        ).alias("n_risk"),
    )


def kaplan_meier(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    start_event: str = "view",
    end_event: str = "purchase",
    cohort_fmt: str = "yyyy-MM",
    decimals: int = 6,
) -> DataFrame:
    """Per-cohort Kaplan–Meier curve of time from first ``start_event``
    to first subsequent ``end_event``, right-censored at each subject's
    last observed event.

    Cohort = ``date_format(entry, cohort_fmt)`` (calendar month by
    default).  Returns one row per (cohort, distinct duration):
    ``(cohort, dur_us, n_risk, d, censored, survival)`` where ``d`` is
    failures at that duration, ``censored`` the subjects censored
    there, ``n_risk`` the at-risk count just before it, and
    ``survival`` the product-limit S(t) rounded to ``decimals``.
    """
    cur = _risk_grid(df, key, ts, event_col, start_event, end_event, cohort_fmt)
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # product-limit as exp of the cumulative log — identical op tree in
    # the oracle; d = n_risk (everyone at risk fails, only possible at
    # the cohort's last time point) pins S to exactly 0
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(wcum)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(term).over(wcum)), decimals)
    )
    return cur.select(
        "cohort", "dur_us", "n_risk", "d", "censored", surv.alias("survival")
    )


def nelson_aalen(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    start_event: str = "view",
    end_event: str = "purchase",
    cohort_fmt: str = "yyyy-MM",
    decimals: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative hazard over the same risk grid as
    `kaplan_meier`: ``H(t) = sum_{t_i <= t} d_i / n_i`` (Aalen 1978),
    plus the Breslow survival estimate ``exp(-H)`` — the hazard-side
    twin of the product-limit curve, preferred when the HAZARD (how
    conversion intensity evolves with time-in-funnel) is the object of
    study rather than the survival fraction.  Same exact-integer grid;
    the only floats are the d/n ratio sum and its exp, rounded
    ``decimals`` — the identical op tree on both engines.
    """
    cur = _risk_grid(df, key, ts, event_col, start_event, end_event, cohort_fmt)
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hz = F.sum(F.col("d") / F.col("n_risk")).over(wcum)
    return cur.select(
        "cohort",
        "dur_us",
        "n_risk",
        "d",
        F.round(hz, decimals).alias("cum_hazard"),
        F.round(F.exp(-hz), decimals).alias("breslow_surv"),
    )


def aalen_johansen(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    start_event: str = "view",
    cause_a: str = "purchase",
    cause_b: str = "error",
    cohort_fmt: str = "yyyy-MM",
    decimals: int = 6,
) -> DataFrame:
    """Aalen–Johansen cumulative incidence under competing risks
    (Aalen & Johansen, Scand. J. Stat. 1978): after entry (first
    ``start_event``), a subject can first hit ``cause_a`` (convert)
    OR ``cause_b`` (fail) — the two absorbing states compete, and the
    naive per-cause KM complement (1 - KM treating the other cause as
    censoring) is BIASED upward; the AJ estimator

        CIF_k(t) = sum_{s<=t} S(s-) * d_k(s) / n(s)

    with S the overall (any-cause) product-limit, is the correct
    decomposition: CIF_a + CIF_b + S = 1 at every grid point.

    Subject definitions are kaplan_meier's with the failure clause
    split by cause: failure time = the earlier of the first
    at-or-after-entry ``cause_a`` / ``cause_b`` event (an exact-us tie
    resolves to ``cause_a``, deterministic), censor at last observed
    event.  The grid, d_a, d_b, censored and n_risk are exact
    integers; S(s-) uses the km exp/ln device over STRICTLY PRECEDING
    rows and each CIF is a cumulative sum of per-row double terms —
    sequential in the same sort order on both engines, so
    deterministic (the exp(cumsum(ln)) precedent).  The d = n pinning
    case zeroes S and every later increment, exactly like km.

    Returns (cohort, dur_us, n_risk, d_a, d_b, censored, survival,
    cif_a, cif_b), one row per (cohort, distinct duration).
    """
    wk = Window.partitionBy("_k")
    e = df.select(
        F.col(key).alias("_k"),
        epoch_us(ts).alias("_u"),
        F.col(event_col).alias("_et"),
    )
    e = e.withColumn(
        "_fv", F.min(F.when(F.col("_et") == start_event, F.col("_u"))).over(wk)
    ).where(F.col("_fv").isNotNull())
    subj0 = e.groupBy("_k", "_fv").agg(
        F.min(
            F.when(
                (F.col("_et") == cause_a) & (F.col("_u") >= F.col("_fv")),
                F.col("_u"),
            )
        ).alias("_fa"),
        F.min(
            F.when(
                (F.col("_et") == cause_b) & (F.col("_u") >= F.col("_fv")),
                F.col("_u"),
            )
        ).alias("_fb"),
        F.max("_u").alias("_le"),
    )
    is_a = F.col("_fa").isNotNull() & (
        F.col("_fb").isNull() | (F.col("_fa") <= F.col("_fb"))
    )
    is_b = F.col("_fb").isNotNull() & ~is_a
    subj = subj0.select(
        F.date_format(F.timestamp_micros(F.col("_fv")), cohort_fmt).alias(
            "cohort"
        ),
        F.when(is_a, F.col("_fa") - F.col("_fv"))
        .when(is_b, F.col("_fb") - F.col("_fv"))
        .otherwise(F.col("_le") - F.col("_fv"))
        .alias("dur_us"),
        is_a.cast("int").alias("_ea"),
        is_b.cast("int").alias("_eb"),
    )
    grid = subj.groupBy("cohort", "dur_us").agg(
        F.sum("_ea").alias("d_a"),
        F.sum("_eb").alias("d_b"),
        F.sum(F.lit(1) - F.col("_ea") - F.col("_eb")).alias("censored"),
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wprev = (
        Window.partitionBy("cohort")
        .orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy("cohort")
    tot = F.col("d_a") + F.col("d_b") + F.col("censored")
    cur = grid.select(
        "cohort",
        "dur_us",
        "d_a",
        "d_b",
        "censored",
        (
            F.sum(tot).over(wtot) - F.sum(tot).over(wcum) + tot
        ).alias("n_risk"),
    )
    d = F.col("d_a") + F.col("d_b")
    n = F.col("n_risk")
    term = F.when(d < n, F.log(F.lit(1.0) - d / n)).otherwise(F.lit(0.0))
    hit_cum = F.max((d == n).cast("int")).over(wcum)
    hit_prev = F.coalesce(
        F.max((d == n).cast("int")).over(wprev), F.lit(0)
    )
    surv = F.when(hit_cum == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(term).over(wcum)), decimals)
    )
    sprev = F.when(hit_prev == 1, F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.sum(term).over(wprev), F.lit(0.0)))
    )
    inc_a = sprev * (F.col("d_a") / n)
    inc_b = sprev * (F.col("d_b") / n)
    return cur.select(
        "cohort",
        "dur_us",
        "n_risk",
        "d_a",
        "d_b",
        "censored",
        surv.alias("survival"),
        (F.round(F.sum(inc_a).over(wcum), decimals) + F.lit(0.0)).alias(
            "cif_a"
        ),
        (F.round(F.sum(inc_b).over(wcum), decimals) + F.lit(0.0)).alias(
            "cif_b"
        ),
    )
