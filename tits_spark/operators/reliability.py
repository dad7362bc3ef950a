"""Internal-consistency reliability of the per-key activity grid:
Cronbach's alpha (Cronbach, Psychometrika 1951) and the one-way
random-effects intraclass correlation ICC(1,1) (Shrout & Fleiss,
Psych. Bulletin 1979), treating each of the k = 24 hours of day as an
"item"/"rater" and each day in the key's observed span as a
"subject", scored by the event count in that (day, hour) cell.  The
monitoring question they answer: do the hours AGREE on which days
are big — i.e. does day-level load move every hour together (high
alpha / ICC(1)), or is each (day, hour) cell essentially independent
noise (near 0)?  Reference parity: no analog in the reference
engine; extends the repo's ANOVA/agreement families.

Exactness.  Every moment is an exact integer on the count lattice —
missing (day, hour) cells score 0 and therefore contribute nothing
to any sum, so NO zero-fill explode is needed; only the day-span
count n = max_day - min_day + 1 knows about empty cells.  With
G = total events, SST = sum of squared cell counts, DSS = sum of
squared day totals, HSS = sum of squared hour totals, and clearing
all the textbook denominators:

    alpha = (k/(k-1)) * (1 - (n*SST - HSS) / (n*DSS - G^2))

    ICC1  = [ (k-1)*(n*DSS - G^2) - (n-1)*(k*SST - DSS) ]
          / [ (k-1)*(n*DSS - G^2) + (n-1)*(k-1)*(k*SST - DSS) ]

(both derived by multiplying the mean-square ratios through by
n*k*(n-1)*(k-1); the item variances share the common n*(n-1)
denominator so their sum clears in one step).  Numerators and
denominators accumulate in decimal(38,0); alpha and ICC1 are one
double division each, round 6, signed zero normalized.  Degenerate
keys (constant day totals: n*DSS == G^2, or an ICC denominator of 0)
emit NULL for the affected readout.

Plan shape (100 TB): one scan -> hash agg to the (key, day, hour)
count lattice -> three per-key reductions (cell moments, day totals,
hour totals) joined per key — each side is a per-key AGGREGATE
(~|keys| rows), so the joins are broadcast-eligible at any scale.
No window, no Python, no cartesian, no zero-fill explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"
US_PER_DAY = 86_400_000_000


def cronbach_icc(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    k_items: int = 24,
    min_days: int = 7,
) -> DataFrame:
    """Cronbach alpha + ICC(1,1) of the day x hour count grid per key.

    Returns (key, n_days, g_total, sq_sum, day_ss, hour_ss, alpha,
    icc1); keys whose day span is under ``min_days`` drop."""
    k = int(k_items)
    lat = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(US_PER_DAY)).cast("long").alias("d"),
            F.hour(ts).alias("h"),
        )
        .groupBy("key", "d", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    # three per-key reductions consume the lattice; without persist
    # each re-ran the raw scan + lattice aggregate (3 scans at any
    # scale — the gk_gamma persisted-lattice device applies; the
    # lattice is |key x day x hour| rows, bounded)
    lat = lat.persist()
    cells = lat.groupBy("key").agg(
        (F.max("d") - F.min("d") + 1).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("g_total"),
        F.sum(F.col("x").cast(DEC) * F.col("x")).alias("sq_sum"),
    )
    days = (
        lat.groupBy("key", "d")
        .agg(F.sum("x").alias("t"))
        .groupBy("key")
        .agg(F.sum(F.col("t").cast(DEC) * F.col("t")).alias("day_ss"))
    )
    hours = (
        lat.groupBy("key", "h")
        .agg(F.sum("x").alias("c"))
        .groupBy("key")
        .agg(F.sum(F.col("c").cast(DEC) * F.col("c")).alias("hour_ss"))
    )
    j = (
        cells.join(days, "key")
        .join(hours, "key")
        .filter(F.col("n_days") >= int(min_days))
    )
    n = F.col("n_days").cast(DEC)
    g = F.col("g_total").cast(DEC)
    sst = F.col("sq_sum")
    dss = F.col("day_ss")
    hss = F.col("hour_ss")
    bvar = (n * dss - g * g).cast(DEC)  # n*DSS - G^2
    wvar = (F.lit(k).cast(DEC) * sst - dss).cast(DEC)  # k*SST - DSS
    alpha = F.when(
        bvar != 0,
        F.round(
            F.lit(k / (k - 1.0))
            * (
                F.lit(1.0)
                - (n * sst - hss).cast("double") / bvar.cast("double")
            ),
            6,
        )
        + F.lit(0.0),
    )
    icc_num = (F.lit(k - 1).cast(DEC) * bvar - (n - 1) * wvar).cast(DEC)
    icc_den = (
        F.lit(k - 1).cast(DEC) * bvar
        + (n - 1) * F.lit(k - 1).cast(DEC) * wvar
    ).cast(DEC)
    icc1 = F.when(
        icc_den != 0,
        F.round(icc_num.cast("double") / icc_den.cast("double"), 6)
        + F.lit(0.0),
    )
    return j.select(
        "key",
        "n_days",
        "g_total",
        sst.cast("long").alias("sq_sum"),
        dss.cast("long").alias("day_ss"),
        hss.cast("long").alias("hour_ss"),
        alpha.alias("alpha"),
        icc1.alias("icc1"),
    )
