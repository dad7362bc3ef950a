"""Deterministic circular block bootstrap — a confidence interval for
the mean of an AUTOCORRELATED series, without pretending the rows are
i.i.d. (Politis & Romano 1992, public method; Kunsch 1989 for the
block idea).

An irregular event series is autocorrelated (that is the whole point
of this engine — see iact: effective sample size << n), so the naive
mean +/- 1.96*s/sqrt(n) interval is too narrow. The block bootstrap
resamples CONTIGUOUS blocks, preserving within-block dependence:
replicate r draws J = ceil(n/L) blocks of length L (the last one
truncated to land on exactly n values) from the circularized series
and takes their mean; the CI is read off the replicate quantiles.

Determinism (the audit argument of operators/sampling.py): block
starts come from the same Knuth multiplicative hash the samplers use
— s(key, r, j) = (((key*131071 + r*J_MAX + j) mod 2^31) * 2654435761
mod 2^32) mod n — a pure function of the data, identical at any
parallelism, restartable, and expressible in ANSI SQL for the oracle
gate. No RNG anywhere.

Exactness: block sums are PREFIX-SUM DIFFERENCES of exact cent
values, so every replicate SUM is an exact int64; the CI bounds are
type-1 order statistics over the B replicate sums — COPIED integers
(the winsorized_stats argument: rank arithmetic only, no interpolated
blend); the readable doubles are one fixed round-6 tree.

Scale design (the 100 TB argument): the resampled series is NEVER
materialized (B replicates of n rows each would be a 100-1000x data
blow-up). Instead each block contributes at most TWO wrap segments,
each segment TWO signed prefix-sum endpoint lookups — a bounded
lattice of <= 4*B*ceil(n/L) endpoint rows per key that equi-joins
(key, pos) against the n-row prefix frame (the event_study shape:
bounded explode + equi-join, never a range join). One data-sized
window builds the prefix sums; everything downstream is
lattice-sized. L should grow with the dependence length (L >> IACT),
B is O(100) — the lattice is ~4*B/L rows per data row, typically < 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / phi, TAOCP vol 3
M31 = 1 << 31
M32 = 1 << 32
J_MAX = 1 << 20  # replicate-index stride in the hash fold


def block_bootstrap_mean(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    n_reps: int = 100,
    block_len: int = 25,
    alpha_pct: int = 5,
    min_points: int = 8,
) -> DataFrame:
    """Per-key circular-block-bootstrap CI for the mean value.

    Returns (key, n_obs, sum_c, lo_sum, hi_sum, mean, ci_lo, ci_hi):
    the row count, the exact total cent sum, the exact replicate-sum
    order statistics at ranks ceil(B*a/2) and ceil(B*(1-a/2)) (a =
    alpha_pct/100), and the three round-6 doubles (all sums divided
    by the same n, so the CI is in value units). Keys with fewer than
    ``min_points`` rows are dropped. The key column must be integral
    (it feeds the hash fold).
    """
    B = int(n_reps)
    L = int(block_len)
    if not (0 < alpha_pct < 100):
        raise ValueError("alpha_pct must be in (0, 100)")
    # type-1 ranks: ceil(B * a/2) and ceil(B * (1 - a/2)); computed in
    # exact integer arithmetic (a/2 = alpha_pct/200)
    k_lo = -(-B * alpha_pct // 200)
    k_hi = -(-B * (200 - alpha_pct) // 200)

    cents = F.round(F.col(value) * 100).cast("long")
    wo = Window.partitionBy("key").orderBy("ts", "c")
    wk = Window.partitionBy("key")
    prefix = (
        df.select(F.col(key).alias("key"), F.col(ts).alias("ts"), cents.alias("c"))
        .withColumn("i", F.row_number().over(wo))
        .withColumn("p", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.count(F.lit(1)).over(wk))
        .filter(F.col("n") >= int(min_points))
        .select("key", "i", "p", "n")
    )
    # three consumers derive from the prefix frame (heads, the lattice,
    # the endpoint join side) — persist it so the raw scan and the
    # prefix window run once (asynccov/tfidf persist precedent; callers
    # that care can clearCache)
    prefix = prefix.persist()
    # one row per key carrying n and the total sum (prefix at i = n)
    heads = prefix.filter(F.col("i") == F.col("n")).select(
        "key", "n", F.col("p").alias("sum_c")
    )

    # bounded lattice: (key, rep, j) -> block start s and length lj;
    # ceil(n/L) in pure integer arithmetic (no double division)
    j_cnt = F.expr(f"(n + {L - 1}) DIV {L}")
    lat = (
        heads.select(
            "key",
            "n",
            "sum_c",
            j_cnt.alias("nj"),
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("r"),
        )
        .select(
            "key",
            "n",
            "sum_c",
            "nj",
            "r",
            F.explode(
                F.sequence(F.lit(0), F.col("nj") - 1)
            ).alias("j"),
        )
    )
    fold = F.pmod(
        F.col("key").cast("long") * F.lit(131071)
        + F.col("r") * F.lit(J_MAX)
        + F.col("j"),
        F.lit(M31),
    )
    s = F.pmod(F.pmod(fold * F.lit(KNUTH), F.lit(M32)), F.col("n"))
    lj = F.when(
        F.col("j") < F.col("nj") - 1, F.lit(L)
    ).otherwise(F.col("n") - (F.col("nj") - 1) * F.lit(L))
    blocks = lat.select(
        "key", "n", "sum_c", "r", s.alias("s"), lj.alias("lj")
    )
    # each block = [s, s+lj) on the circle -> 1 or 2 linear segments,
    # each segment [a, b) -> signed prefix endpoints +P[b], -P[a]
    # (P[0] = 0 rows are skipped; full-wrap picks up sum_c directly)
    e1_hi = F.least(F.col("s") + F.col("lj"), F.col("n"))
    wrap = F.col("s") + F.col("lj") - F.col("n")  # >0 when wrapping
    endpoints = blocks.select(
        "key",
        "r",
        F.explode(
            F.array(
                F.struct(e1_hi.alias("pos"), F.lit(1).alias("sgn")),
                F.struct(F.col("s").alias("pos"), F.lit(-1).alias("sgn")),
                F.struct(
                    F.when(wrap > 0, wrap).otherwise(F.lit(0)).alias("pos"),
                    F.lit(1).alias("sgn"),
                ),
            )
        ).alias("e"),
    ).select(
        "key", "r", F.col("e.pos").alias("pos"), F.col("e.sgn").alias("sgn")
    ).filter(F.col("pos") > 0)
    summed = (
        endpoints.join(
            prefix.select("key", F.col("i").alias("pos"), "p"),
            ["key", "pos"],
        )
        .groupBy("key", "r")
        .agg(F.sum(F.col("sgn") * F.col("p")).alias("srep"))
    )
    wr = Window.partitionBy("key").orderBy("srep", "r")
    ranked = summed.withColumn("rk", F.row_number().over(wr))
    ci = (
        ranked.filter(F.col("rk").isin(k_lo, k_hi))
        .groupBy("key")
        .agg(
            F.min(F.when(F.col("rk") == k_lo, F.col("srep"))).alias("lo_sum"),
            F.min(F.when(F.col("rk") == k_hi, F.col("srep"))).alias("hi_sum"),
        )
    )
    out = heads.join(ci, "key")
    n_d = F.col("n").cast("double") * F.lit(100.0)
    return out.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        "sum_c",
        "lo_sum",
        "hi_sum",
        (F.round(F.col("sum_c").cast("double") / n_d, 6) + F.lit(0.0)).alias("mean"),
        (F.round(F.col("lo_sum").cast("double") / n_d, 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(F.col("hi_sum").cast("double") / n_d, 6) + F.lit(0.0)).alias("ci_hi"),
    )
