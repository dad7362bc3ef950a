"""Detrended fluctuation analysis (DFA-1) per key — scale-free memory
measured the way physicists do it.

The windowed-regression counterpart of hurst (operators/hurst.py, R/S
point estimate) and lo_rs (operators/kpss.py, the test statistic):
DFA (Peng et al., Phys Rev E 1994, public formula) integrates the
series, splits the profile into boxes of size s, removes a per-box
least-squares LINE, and reads the exponent alpha from how the RMS
residual F(s) grows with s. alpha ~ 0.5 is memoryless, > 0.5
persistent, ~ 1 is 1/f, ~ 1.5 a random walk — and unlike R/S it is
robust to nonstationary level shifts, which rolled-up transcript
telemetry has in abundance.

Two formulation choices carry the exactness and the scale story:

1. NO mean subtraction. The textbook profile is
   Y_t = sum_{i<=t} (x_i - xbar); the -t*xbar term is LINEAR in t, and
   DFA-1 removes a fitted line per box, so it cancels EXACTLY in every
   box residual. Using the raw cumulative sum C_t = sum c_i (exact
   int64, |C| <= n*|c|max) keeps the whole lattice integer with no
   n-scaling blowup (the kpss E_t device would put n^2 factors under
   the square).
2. FIXED dyadic box sizes s in {4, 8, 16, 32} (octaves 2..5). For
   fixed s the regressor moments are constants — Sj = s(s+1)/2,
   Sxx_c = s*sum j^2 - Sj^2 = s^2(s^2-1)/12 — so the per-box cleared
   least-squares residual

       SSE_c = Syy_c * Sxx_c - Sxy_c^2,
       Syy_c = s*sum y^2 - (sum y)^2,  Sxy_c = s*sum j*y - Sj*sum y

   is one decimal(38,0) expression over exact integer box sums, and
   F^2(s) = sum_boxes SSE_c / (nboxes * s^2 * Sxx_c) (SSE per box is
   SSE_c/(s*Sxx_c); the RMS over boxes divides by s again). alpha is
   the least-squares slope of 0.5*log2 F^2(s) on log2 s, which for the
   four octaves {2,3,4,5} collapses to the fixed combination
   (-1.5*y2 - 0.5*y3 + 0.5*y4 + 1.5*y5)/5. Trailing partial boxes are
   dropped (cnt = s), the standard DFA convention.

Exactness: cents + house dup-timestamp rule; every aggregate is an
exact decimal integer (bounds: |y| <= n*|c|max so Syy_c <= s*n^2*c^2
~ 1e24 at n=1e5/6-figure cents, SSE_c <= Syy_c*Sxx_c ~ 1e30, the
per-(key,s) sum adds a nboxes factor — all inside decimal(38,0); ANSI
fails LOUD past it). The only floats are the final identical
double tree + log2 on both engines (log2 is one correctly-rounded
libm call on an O(1e30)-magnitude ratio; any last-ulp wobble is
1e-16 relative on an O(30) log — far inside the 6dp quantum).

Plan shape (the 100 TB argument): ONE scan; dedup agg, the row_number
and cumulative-sum windows, the 4-way octave explode, the
(key, s, box) partial+final aggregate, the (key, s) aggregate and the
final per-key pivot ALL ride hashpartitioning(key) set up by the
dedup exchange (the explode widens rows 4x map-side, no shuffle of
its own; (key,s,box) and (key,s) grouping keys are key-prefixed so
AQE keeps them on the same partitioning). No join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

OCTAVES = (4, 8, 16, 32)
D19 = "decimal(19,0)"
DEC = "decimal(38,0)"


def dfa_alpha(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 64,
) -> DataFrame:
    """Per-key DFA-1 exponent over dyadic box sizes {4, 8, 16, 32}.

    Returns (key, n_obs, lf_4, lf_8, lf_16, lf_32, alpha): the tick
    count, 0.5*log2 F^2(s) per octave and the DFA exponent (all
    rounded to 6dp; alpha NULL when any octave's F^2 is 0, i.e. a
    locally-linear/constant series). Keys shorter than ``min_obs``
    (>= 2 full boxes at the largest octave) are dropped.
    """
    mo = max(int(min_obs), 2 * OCTAVES[-1])

    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    wo = Window.partitionBy("key").orderBy("us")
    wk = Window.partitionBy("key")
    prof = ticks.select(
        "key",
        F.row_number().over(wo).alias("i"),
        F.sum("c")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("y"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("n") >= mo)

    lat = prof.select(
        "key",
        "n",
        "i",
        "y",
        F.explode(F.array(*[F.lit(s) for s in OCTAVES])).alias("s"),
    ).select(
        "key",
        "n",
        "s",
        F.floor((F.col("i") - 1) / F.col("s")).alias("box"),
        (F.col("i") - F.col("s") * F.floor((F.col("i") - 1) / F.col("s")))
        .alias("j"),
        "y",
    )

    boxes = (
        lat.groupBy("key", "s", "box")
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("y").cast(D19)).alias("sy"),
            F.sum(F.col("y").cast(D19) * F.col("y")).alias("syy"),
            F.sum((F.col("j") * F.col("y")).cast(D19)).alias("sjy"),
        )
        .filter(F.col("cnt") == F.col("s"))
    )
    s = F.col("s").cast(DEC)
    sj = (F.col("s") * (F.col("s") + 1) / 2).cast(DEC)
    sxx_c = (
        F.col("s").cast(DEC) * F.col("s") * (F.col("s") * F.col("s") - 1)
        / 12
    ).cast(DEC)
    syy_c = (s * F.col("syy") - F.col("sy") * F.col("sy")).cast(DEC)
    sxy_c = (s * F.col("sjy") - sj * F.col("sy")).cast(DEC)
    sse_c = (syy_c * sxx_c - sxy_c * sxy_c).cast(DEC)

    per_s = boxes.select("key", "s", "n", sse_c.alias("sse_c")).groupBy(
        "key", "s"
    ).agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("sse_c").alias("ssum"),
    )
    # F^2(s) = ssum / (nb * s^2 * Sxx_c); lf = 0.5*log2(F^2)
    sd = F.col("s").cast("double")
    sxx_d = sd * sd * (sd * sd - 1.0) / 12.0
    f2 = F.col("ssum").cast("double") / (
        F.col("nb").cast("double") * sd * sd * sxx_d
    )
    lf = F.when(F.col("ssum") > 0, F.log2(f2) * 0.5)
    per_s = per_s.select("key", "s", "n", lf.alias("lf"))

    pivot = per_s.groupBy("key").agg(
        F.max("n").alias("n_obs"),
        *[
            F.max(F.when(F.col("s") == s_, F.col("lf"))).alias(f"lf_{s_}")
            for s_ in OCTAVES
        ],
    )
    o = [f"lf_{s_}" for s_ in OCTAVES]
    alpha = (
        F.lit(-1.5) * F.col(o[0])
        - F.lit(0.5) * F.col(o[1])
        + F.lit(0.5) * F.col(o[2])
        + F.lit(1.5) * F.col(o[3])
    ) / F.lit(5.0)
    return pivot.select(
        "key",
        F.col("n_obs").cast("long").alias("n_obs"),
        *[F.round(F.col(f"lf_{s_}"), 6).alias(f"lf_{s_}") for s_ in OCTAVES],
        F.round(alpha, 6).alias("alpha"),
    )
