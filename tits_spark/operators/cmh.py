"""Cochran–Mantel–Haenszel stratified 2x2 association per key
(Cochran, Biometrics 1954; Mantel & Haenszel, JNCI 1959): does
exposure move the outcome AFTER controlling for a confounding
stratum?  The canonical deployment here: per user, strata = the 24
hours of day, exposure = weekend, outcome = error event — "is the
weekend error-rate lift real, or is it just that weekends sample
different hours?"  Completes the repo's contingency family
(chi2_indep is one unstratified table; logrank is the time-grid
special case of exactly this pooled O-E machinery).

Per (key, stratum) cell with a = exposed-outcome, r1 = a+b exposed,
c1 = a+c outcome, n = all four:

    O    = sum a                               (exact BIGINT)
    E    = sum r1*c1/n
    V    = sum r1*r0*c1*c0 / (n^2*(n-1))
    CMH  = (O - E)^2 / V          ~ chi2(1)   (no continuity corr.)
    OR   = sum(a*d/n) / sum(b*c/n)            (MH pooled odds ratio)

E, V and the two OR sums are per-stratum rationals, so they are
QUANTIZED onto integer lattices before summation (the logrank
device, same grains): e_ppb = floor(1e9 * r1*c1/n) per stratum,
v_ppm / r_ppm / s_ppm at 1e6, each floor over the identical double
tree on both engines; the sums are exact BIGINTs.  Strata with n < 2
are excluded (their V is undefined and they carry no information);
within a kept stratum a zero margin contributes 0 to every sum
automatically.  CMH and OR are fixed double trees, round 6, signed
zero normalized; V == 0 emits NULL CMH, no unexposed-outcome mass
(s_ppm == 0) emits NULL OR.

Plan shape (100 TB): one scan -> hash agg to the (key, stratum) 2x2
lattice (<= 24 cells/key) -> one per-key hash agg.  No window, no
join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cmh_strata(
    df: DataFrame,
    key: str = "key",
    stratum: str = "stratum",
    exposed: str = "exposed",
    outcome: str = "outcome",
    min_total: int = 50,
) -> DataFrame:
    """CMH chi-square + MH pooled OR per key over ``stratum`` levels.

    ``exposed`` and ``outcome`` are boolean columns.  Returns (key,
    n_strata, o1, e_ppb, v_ppm, r_ppm, s_ppm, cmh_chi2, or_mh); keys
    with fewer than ``min_total`` rows in usable strata drop."""
    ex = F.when(F.col(exposed), 1).otherwise(0)
    oc = F.when(F.col(outcome), 1).otherwise(0)
    lat = (
        df.select(
            F.col(key).alias("key"),
            F.col(stratum).alias("s"),
            ex.alias("e"),
            oc.alias("o"),
        )
        .groupBy("key", "s")
        .agg(
            F.sum(F.col("e") * F.col("o")).alias("a"),
            F.sum(F.col("e") * (1 - F.col("o"))).alias("b"),
            F.sum((1 - F.col("e")) * F.col("o")).alias("c"),
            F.sum((1 - F.col("e")) * (1 - F.col("o"))).alias("d"),
        )
        .filter((F.col("a") + F.col("b") + F.col("c") + F.col("d")) >= 2)
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    n = a + b + c + d
    r1 = a + b
    r0 = c + d
    c1 = a + c
    c0 = b + d
    e_q = F.floor(F.lit(1e9) * (r1 * c1) / n)
    v_q = F.floor(
        F.lit(1e6) * (r1 * r0 * c1 * c0) / (n * n * (n - F.lit(1.0)))
    )
    r_q = F.floor(F.lit(1e6) * (a * d) / n)
    s_q = F.floor(F.lit(1e6) * (b * c) / n)
    agg = (
        lat.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_strata"),
            F.sum("a").cast("long").alias("o1"),
            F.sum(
                (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
            ).alias("_tot"),
            F.sum(e_q).cast("long").alias("e_ppb"),
            F.sum(v_q).cast("long").alias("v_ppm"),
            F.sum(r_q).cast("long").alias("r_ppm"),
            F.sum(s_q).cast("long").alias("s_ppm"),
        )
        .filter(F.col("_tot") >= int(min_total))
    )
    od = F.col("o1").cast("double")
    ev = F.col("e_ppb").cast("double") / 1e9
    vv = F.col("v_ppm").cast("double") / 1e6
    cmh = F.when(
        F.col("v_ppm") > 0,
        F.round((od - ev) * (od - ev) / vv, 6) + F.lit(0.0),
    )
    orr = F.when(
        F.col("s_ppm") > 0,
        F.round(
            F.col("r_ppm").cast("double") / F.col("s_ppm").cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        F.col("n_strata").cast("long").alias("n_strata"),
        "o1",
        "e_ppb",
        "v_ppm",
        "r_ppm",
        "s_ppm",
        cmh.alias("cmh_chi2"),
        orr.alias("or_mh"),
    )


def weekend_error_cmh(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
    outcome_type: str = "error",
) -> DataFrame:
    """Hour-stratified weekend-vs-error CMH over the events shape."""
    return cmh_strata(
        df.select(
            F.col(key).alias("key"),
            F.hour(ts).alias("stratum"),
            F.dayofweek(ts).isin(1, 7).alias("exposed"),
            (F.col(event_type) == outcome_type).alias("outcome"),
        ),
    )


def cochran_armitage_hourly(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
    outcome_type: str = "error",
    min_total: int = 50,
) -> DataFrame:
    """Cochran–Armitage test for TREND in a binary rate across
    ordered categories (Cochran 1954; Armitage 1955), per key, with
    hour-of-day as the ordered score s = 0..23: does the error
    propensity climb (or fall) through the day?  The ordered
    companion of this module's CMH (which conditions the association
    OUT of the strata; this tests the monotone alternative the
    2x24 chi-square wastes power spreading over 23 df).

    Clearing the textbook standardization by N^3, with N total
    events, X outcomes, and the integer lattices Sx = sum s*x_h,
    Sn = sum s*n_h, Sn2 = sum s^2*n_h:

        z = (N*Sx - X*Sn) * sqrt(N)
            / sqrt( X*(N-X) * (N*Sn2 - Sn^2) )

    numerator and the radicand are EXACT decimal(38,0) integers; z is
    one double tree, round 6, signed zero normalized.  A degenerate
    radicand (all outcomes, no outcomes, or a single populated hour)
    emits NULL.

    Plan: one (key, hour) conditional-sum hash agg -> one per-key
    hash agg (the cmh/welch_t cheapest shape).  No window, no join,
    no Python.

    Returns (key, n, x, trend_num, ca_z)."""
    DEC = "decimal(38,0)"
    oc = F.when(F.col(event_type) == outcome_type, 1).otherwise(0)
    lat = (
        df.select(
            F.col(key).alias("key"),
            F.hour(ts).alias("h"),
            oc.alias("o"),
        )
        .groupBy("key", "h")
        .agg(F.count(F.lit(1)).alias("n_h"), F.sum("o").alias("x_h"))
    )
    agg = (
        lat.groupBy("key")
        .agg(
            F.sum("n_h").cast("long").alias("n"),
            F.sum("x_h").cast("long").alias("x"),
            F.sum(F.col("h").cast(DEC) * F.col("x_h")).alias("sx"),
            F.sum(F.col("h").cast(DEC) * F.col("n_h")).alias("sn"),
            F.sum(
                (F.col("h").cast(DEC) * F.col("h")) * F.col("n_h")
            ).alias("sn2"),
        )
        .filter(F.col("n") >= int(min_total))
    )
    nn = F.col("n").cast(DEC)
    xx = F.col("x").cast(DEC)
    num = (nn * F.col("sx") - xx * F.col("sn")).cast(DEC)
    rad = (
        (xx * (nn - xx)).cast(DEC)
        * (nn * F.col("sn2") - (F.col("sn") * F.col("sn")).cast(DEC)).cast(
            DEC
        )
    ).cast(DEC)
    z = F.when(
        rad > 0,
        F.round(
            num.cast("double")
            * F.sqrt(F.col("n").cast("double"))
            / F.sqrt(rad.cast("double")),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        "n",
        "x",
        num.cast("long").alias("trend_num"),
        z.alias("ca_z"),
    )
