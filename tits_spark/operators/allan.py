"""Allan variance over dyadic averaging windows, per key.

AVAR(tau) = 1/(2(M-1)) * sum_i (ybar_{i+1} - ybar_i)^2 over CONSECUTIVE
non-overlapping tau-length bins — the classic oscillator-stability
statistic (Allan 1966, public formula), and a natural tits-style
cascade: the tau bins double octave by octave, and a 2tau bin is the
exact merge of its two tau children (sums and counts are additive), so
the whole octave ladder costs ONE raw scan: the base bins explode
their (tiny) octave lattice and re-merge — the same
continuous-aggregate economics as operators/rollup.py's tier cascade
(ref: /root/reference/src/tits.c rollup tiers). A chain of derived
per-octave frames would instead re-trigger the raw scan once per tier
(measured: 3x the wall at bench scale).

Exactness device (the repo's integer-moment discipline): bin sums are
exact BIGINT cents, each bin mean is ONE double division c/n, the pair
difference is quantized to an integer lattice (floor(d * 1e4), i.e.
1e-6 dollars) and the sum of squares accumulates in decimal(38,0) —
integer addition commutes, so Spark's partial-agg order vs DuckDB's
single-threaded order cannot diverge. Only the final
sum/(2*n_pairs) happens in doubles, identically on both sides.

Gap-awareness: bins with no observations simply don't exist; only
adjacent-bin pairs (b+1 present) enter the sum, so long silences
contribute nothing rather than fabricating zero bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def allan_variance(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    base_tau_s: int = 86400,
    n_octaves: int = 3,
) -> DataFrame:
    """Per-key Allan variance at taus base, 2*base, ... 2^(k-1)*base.

    Returns (key, tau_s, n_pairs, avar_q): the Allan variance on the
    (1e-4 cent)^2 quantized-difference lattice, floored to BIGINT
    (see module docstring). Keys lacking two adjacent bins at a tau drop out of
    that tau, matching the oracle.
    """
    tau_us = int(base_tau_s) * 1_000_000
    cents = F.round(F.col(value) * 100).cast("long")
    # base-octave bins: ONE shuffle on (key, bin) — and ONE raw scan
    # total: the octave ladder is an EXPLODE over this small frame
    # (floor-halving o times == direct floor division by 2^o), not a
    # chain of derived frames that would re-trigger the scan per tier
    bins = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), tau_us).alias("b"),
            cents.alias("c"),
        )
        .groupBy("key", "b")
        .agg(F.sum("c").alias("c"), F.count(F.lit(1)).alias("n"))
    )
    octaves = (
        bins.select(
            "key", "c", "n",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_octaves) - 1))).alias("o"),
            F.col("b").alias("b0"),
        )
        .select(
            "key", "o", "c", "n",
            # 2^o exact in double for any sane octave count
            floordiv(
                F.col("b0"), F.pow(F.lit(2.0), F.col("o")).cast("long")
            ).alias("b"),
        )
        .groupBy("key", "o", "b")
        .agg(F.sum("c").alias("c"), F.sum("n").alias("n"))
    )
    w = Window.partitionBy("key", "o").orderBy("b")
    pairs = (
        octaves.withColumn("b2", F.lead("b").over(w))
        .withColumn("c2", F.lead("c").over(w))
        .withColumn("n2", F.lead("n").over(w))
        .filter(F.col("b2") == F.col("b") + 1)
    )
    d = (F.col("c2") / F.col("n2")) - (F.col("c") / F.col("n"))
    q = F.floor(d * 10000.0).cast("decimal(19,0)")
    return (
        pairs.select("key", "o", (q * q).alias("q2"))
        .groupBy("key", "o")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("q2").alias("s"))
        .select(
            "key",
            (F.lit(float(base_tau_s)) * F.pow(F.lit(2.0), F.col("o")))
            .cast("long").alias("tau_s"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            # floor, not round: tie-free where round() half-modes
            # diverge at the .5 lattice (holt precedent); the q
            # lattice is 1e-6 value units, so one avar unit is
            # 1e-12 value^2 — no useful precision below it
            F.floor(
                F.col("s").cast("double") / (2.0 * F.col("n_pairs"))
            ).cast("long").alias("avar_q"),
        )
    )
