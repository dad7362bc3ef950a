"""Brunner–Munzel test per key (Brunner & Munzel, Biometrical
Journal 2000 — public formulas; the lawstat reference
implementation's algebra), weekend vs weekday: the modern
Mann-Whitney replacement. MW's null assumes exchangeable
distributions, so unequal variances inflate its size; BM studentizes
the same rank contrast by the empirical PLACEMENT variances of each
sample, stays valid under variance heterogeneity, and hands back the
common-language effect p_hat = P(X < Y) + 0.5*P(X = Y) for free.

Everything runs on the per-key (cents) tie-grid CELL level — rows in
the same (key, cents, label) cell share both midranks, so no per-row
work exists. With doubled combined midranks rr = 2*below_all + t + 1
and doubled own-sample midranks hh = 2*below_own + c_own + 1, the
doubled placement d = rr - hh is an exact integer per cell, and with
per-sample sums D1 = sum d, Q1 = sum d^2 (cell-multiplied):

    A_i  = n_i*Q_i - D_i^2                 (cleared placement SS)
    VSUM = A_1/(4*(n_1-1)) + A_2/(4*(n_2-1))   (= n1*v1 + n2*v2)
    NUM  = n_1*sum(rr_2) - n_2*sum(rr_1)   (cleared mean-rank gap)
    BM   = NUM / (2*N*sqrt(VSUM))
    p^   = (sum(rr_2) - n_2*(n_2+1)) / (2*n_1*n_2)
    df   = VSUM^2 / ((n1*v1)^2/(n1-1) + (n2*v2)^2/(n2-1))

A_i, NUM and the rr sums are exact decimal integers (bounds: rr <=
2N so Q <= 4N^3, A <= 4N^4 — inside decimal(38,0) to N ~ 1e9, and
int64-emitable below N ~ 2^15.75... the D/Q surface is emitted as
BIGINT under the cvm-style documented ceiling N ~ 40k rows/key for
A_i; the statistic itself stays on the decimal lattice regardless);
BM, p_hat and df are fixed double trees, round 6, signed zero
normalized. Degenerate placements (A_1 + A_2 = 0: complete
separation or everything tied) emit NULL BM/df — the documented BM
breakdown case.

Plan shape (100 TB): one scan -> hash agg to the per-key tie grid ->
ONE (key)-window cumulative chain (three running sums share the
sort) -> one hash agg on the same hash(key) exchange. No joins, no
Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def brunner_munzel(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 10,
) -> DataFrame:
    """Per-key Brunner–Munzel W between rows flagged ``is_a`` (sample
    1) and the rest (sample 2). Returns (key, n_a, n_b, a1, a2,
    p_hat, bm_w, bm_df); keys with either sample below ``min_each``
    drop and degenerate-placement keys emit NULL bm_w/bm_df."""
    me = max(int(min_each), 2)
    a = F.when(F.col(is_a), 1).otherwise(0)
    grid = (
        df.select(
            F.col(key).alias("key"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
            a.alias("a"),
        )
        .groupBy("key", "c")
        .agg(
            F.sum("a").alias("ca"),
            F.sum(F.lit(1) - F.col("a")).alias("cb"),
        )
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col("ca") + F.col("cb")
    cum = grid.select(
        "key",
        "ca",
        "cb",
        (2 * (F.sum(t).over(wcum) - t) + t + 1).alias("rr"),
        (2 * (F.sum("ca").over(wcum) - F.col("ca")) + F.col("ca") + 1)
        .alias("ha"),
        (2 * (F.sum("cb").over(wcum) - F.col("cb")) + F.col("cb") + 1)
        .alias("hb"),
    )
    da = (F.col("rr") - F.col("ha")).cast(DEC)
    db = (F.col("rr") - F.col("hb")).cast(DEC)
    agg = (
        cum.groupBy("key")
        .agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
            F.sum(F.col("ca").cast(DEC) * F.col("rr")).alias("_ra"),
            F.sum(F.col("cb").cast(DEC) * F.col("rr")).alias("_rb"),
            F.sum(F.col("ca").cast(DEC) * da).alias("_d1"),
            F.sum((F.col("ca").cast(DEC) * da * da).cast(DEC)).alias("_q1"),
            F.sum(F.col("cb").cast(DEC) * db).alias("_d2"),
            F.sum((F.col("cb").cast(DEC) * db * db).cast(DEC)).alias("_q2"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    n1 = F.col("n_a").cast(DEC)
    n2 = F.col("n_b").cast(DEC)
    nn = n1 + n2
    a1 = n1 * F.col("_q1") - (F.col("_d1") * F.col("_d1")).cast(DEC)
    a2 = n2 * F.col("_q2") - (F.col("_d2") * F.col("_d2")).cast(DEC)
    withm = agg.select(
        "key",
        "n_a",
        "n_b",
        a1.alias("_a1"),
        a2.alias("_a2"),
        (n1 * F.col("_rb") - n2 * F.col("_ra")).alias("_num"),
        F.col("_rb").alias("_rrb"),
    )
    # n_i * v_i = A_i / (4*(n_i - 1))
    nv1 = F.col("_a1").cast("double") / (
        F.lit(4.0) * (F.col("n_a") - 1).cast("double")
    )
    nv2 = F.col("_a2").cast("double") / (
        F.lit(4.0) * (F.col("n_b") - 1).cast("double")
    )
    vsum = nv1 + nv2
    degen = (F.col("_a1") + F.col("_a2")) == 0
    bm = F.when(
        ~degen,
        F.round(
            F.col("_num").cast("double")
            / (
                F.lit(2.0)
                * (F.col("n_a") + F.col("n_b")).cast("double")
                * F.sqrt(vsum)
            ),
            6,
        )
        + F.lit(0.0),
    )
    dfree = F.when(
        ~degen,
        F.round(
            vsum * vsum
            / (
                nv1 * nv1 / (F.col("n_a") - 1).cast("double")
                + nv2 * nv2 / (F.col("n_b") - 1).cast("double")
            ),
            6,
        )
        + F.lit(0.0),
    )
    phat = (
        F.round(
            (
                F.col("_rrb")
                - (n2 * (n2 + 1)).cast(DEC)
            ).cast("double")
            / (F.lit(2.0) * (n1 * n2).cast("double")),
            6,
        )
        + F.lit(0.0)
    )
    return withm.select(
        "key",
        "n_a",
        "n_b",
        F.col("_a1").cast("long").alias("a1"),
        F.col("_a2").cast("long").alias("a2"),
        phat.alias("p_hat"),
        bm.alias("bm_w"),
        dfree.alias("bm_df"),
    )
