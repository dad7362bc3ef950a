"""Benford first-digit conformance audit per key — the classic
forensic data-quality screen (Newcomb 1881, Benford 1938, Nigrini
1996; public formulas) for synthetic/duplicated/fabricated value
columns in a training-data feed.

For each key the positive values are put on the cents lattice and
the leading decimal digit d of the cent count is tallied (the
leading digit of round(100*v) equals the leading digit of v for
v >= 0.01, and the lattice makes the digit a pure integer function
both engines compute identically). Against the Benford law
P(d) = log10(1 + 1/d) we report:

  - n, n1..n9            exact BIGINT digit counts;
  - chi2                 sum_d (n_d - n*e_d)^2 / (n*e_d) with the
                         expected shares e_d carried as the EXACT
                         rational e_ppm_d / 1e6 (the rounded-ppm
                         Benford lattice, which sums to exactly 1e6)
                         so each term is (1e6*n_d - n*e_ppm_d)^2 /
                         (1e6 * n * e_ppm_d) — integer numerator on
                         decimal(38,0) (1e6*n_d squares past int64
                         at corpus scale), one fixed 9-term double
                         tree in digit order, round 6;
  - mad_ppm              Nigrini's mean absolute deviation on the
                         ppm lattice: floor(sum_d |n_d*1e6 // n -
                         e_ppm_d| / 9) — pure BIGINT.

Carrying the expected shares as integer ppm constants (not
engine-computed log10) is what makes the statistic cross-engine
bit-identical: both engines divide the same exact integers in the
same fixed order.

Plan shape (100 TB): one scan -> hash agg to the <=9-row (key, d)
digit lattice (map-side partials carry the reduction) -> a trivial
pivot agg on the lattice, then per-row closed forms. The split at
the lattice is what the streaming twin shares: counts merge by
adding, benford_finalize is the common readout. No joins, no
windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv

# round(log10(1 + 1/d) * 1e6): the rounded-ppm Benford lattice.
# Sums to exactly 1_000_000, so the expected counts n*e_d/1e6
# partition n exactly in the chi2 denominator algebra.
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)

DEC = "decimal(38,0)"


def benford_counts(
    df: DataFrame, key: str = "key", value: str = "value"
) -> DataFrame:
    """The exact (key, d, n) first-digit count lattice over positive
    cents — the mergeable state the streaming twin accumulates (counts
    add; benford_finalize turns any merged lattice into the report)."""
    cents = F.round(F.col(value) * 100).cast("long")
    rows = df.select(F.col(key).alias("key"), cents.alias("c")).filter(
        F.col("c") > 0
    )
    d1 = F.substring(F.col("c").cast("string"), 1, 1).cast("int")
    return (
        rows.select("key", d1.alias("d"))
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def benford_finalize(counts: DataFrame, min_n: int = 50) -> DataFrame:
    """Pivot a (key, d, n) digit-count lattice into the audit report
    (key, n, n1..n9, chi2, mad_ppm) — the shared finalize stage: the
    batch operator and the streaming twin's reader both end here, so
    their reports are bit-equal over equal counts by construction."""
    pivots = [
        F.coalesce(
            F.sum(F.when(F.col("d") == d, F.col("n"))), F.lit(0)
        ).alias(f"n{d}")
        for d in range(1, 10)
    ]
    agg = (
        counts.groupBy("key")
        .agg(F.sum("n").alias("n"), *pivots)
        .filter(F.col("n") >= int(min_n))
    )
    # chi2 term for digit d: (1e6*n_d - n*e_ppm)^2 / (1e6*n*e_ppm);
    # numerator on decimal(38,0) (1e6*n_d ~ 1e18 at corpus scale,
    # squared ~ 1e36), denominator <= 1e6 * n * 3.1e5 — decimal too
    # for uniformity. Fixed digit-order sum = one double tree.
    def term(d: int):
        e = BENFORD_PPM[d - 1]
        num = (
            F.lit(1_000_000).cast(DEC) * F.col(f"n{d}")
            - F.col("n").cast(DEC) * F.lit(e)
        )
        den = F.lit(1_000_000).cast(DEC) * F.col("n") * F.lit(e)
        return (num * num).cast("double") / den.cast("double")

    chi2 = F.round(sum(term(d) for d in range(1, 10)), 6) + F.lit(0.0)
    mad = floordiv(
        sum(
            F.abs(
                floordiv(F.col(f"n{d}") * F.lit(1_000_000), F.col("n"))
                - F.lit(BENFORD_PPM[d - 1])
            )
            for d in range(1, 10)
        ),
        9,
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n"),
        *[F.col(f"n{d}").cast("long").alias(f"n{d}") for d in range(1, 10)],
        chi2.alias("chi2"),
        mad.cast("long").alias("mad_ppm"),
    )


def benford_audit(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    min_n: int = 50,
) -> DataFrame:
    """Per-key Benford first-digit audit over positive values on the
    cents lattice. Returns (key, n, n1..n9, chi2, mad_ppm); keys with
    fewer than min_n positive observations drop out (the chi2
    approximation needs expected counts >= ~5 in the rare digits)."""
    return benford_finalize(benford_counts(df, key, value), min_n)
