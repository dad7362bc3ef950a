"""Brier score with the Murphy (1973) reliability / resolution /
uncertainty decomposition, per key, for the climatological
stratum-rate forecast: the corpus-wide outcome rate of each stratum
(here: hour of day) is the "forecast" probability, each key's events
are the verifications.  The calibration-governance readout that
complements isotonic (which FITS a calibration; this SCORES one):
how much of a key's Brier score is mis-calibration of the global
hourly forecast on that key (REL), how much discrimination the hour
bins actually deliver (RES), and the outcome-base-rate floor (UNC):

    BS = REL - RES + UNC             (exact for binned forecasts)
    REL = (1/n) sum_h n_h (f_h - o_h)^2
    RES = (1/n) sum_h n_h (o_h - obar)^2
    UNC = obar (1 - obar)

with f_h the global stratum rate, o_h the key's stratum outcome
rate, obar the key's base rate.  Per-stratum terms are rationals
(three different denominators), so each cell term is QUANTIZED to
the integer ppm lattice — floor(1e6 * term) over an identical double
tree on both engines (the logrank/cmh device) — and summed as exact
BIGINT; n * REL etc. are emitted as *_ppm lattices and the per-row
normalized readouts stay on the floor lattice too (floor(ppm/n)/1e6
— round() half-boundaries genuinely diverge across engines when a
ppm sum divides n to an exact decimal half; observed at sf0.1 and
designed out, the bws precedent).  BS is also
accumulated directly (per-cell n f^2 - 2 f s + s expansion, same ppm
grain) so the decomposition identity is checkable to lattice grain.

Plan shape (100 TB): one scan -> (key, stratum) outcome lattice ->
re-aggregate the SAME lattice to the <= |strata| global rate frame
(broadcast join) and the per-key totals frame (key equi-join of two
per-key aggregates).  No window, no Python, no cartesian; the raw
table is never scanned twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def climatology_brier(
    df: DataFrame,
    key: str = "key",
    stratum: str = "stratum",
    outcome: str = "outcome",
    min_total: int = 50,
) -> DataFrame:
    """Murphy-decomposed Brier score per key for the global
    stratum-rate forecast.  Returns (key, n, s, rel_ppm, res_ppm,
    brier_ppm, reliability, resolution, uncertainty, brier); keys
    with fewer than ``min_total`` rows drop."""
    oc = F.when(F.col(outcome), 1).otherwise(0)
    lat = (
        df.select(
            F.col(key).alias("key"),
            F.col(stratum).alias("h"),
            oc.alias("o"),
        )
        .groupBy("key", "h")
        .agg(F.count(F.lit(1)).alias("nc"), F.sum("o").alias("sc"))
    )
    glob = lat.groupBy("h").agg(
        F.sum("nc").alias("gn"), F.sum("sc").alias("gs")
    )
    tot = lat.groupBy("key").agg(
        F.sum("nc").alias("n"), F.sum("sc").alias("s")
    )
    j = lat.join(F.broadcast(glob), "h").join(tot, "key")
    f_h = F.col("gs").cast("double") / F.col("gn").cast("double")
    o_h = F.col("sc").cast("double") / F.col("nc").cast("double")
    obar = F.col("s").cast("double") / F.col("n").cast("double")
    nc = F.col("nc").cast("double")
    sc = F.col("sc").cast("double")
    rel_q = F.floor(F.lit(1e6) * (nc * ((f_h - o_h) * (f_h - o_h))))
    res_q = F.floor(F.lit(1e6) * (nc * ((o_h - obar) * (o_h - obar))))
    bs_q = F.floor(
        F.lit(1e6) * (nc * (f_h * f_h) - F.lit(2.0) * (f_h * sc) + sc)
    )
    agg = (
        j.groupBy("key")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("s").cast("long").alias("s"),
            F.sum(rel_q).cast("long").alias("rel_ppm"),
            F.sum(res_q).cast("long").alias("res_ppm"),
            F.sum(bs_q).cast("long").alias("brier_ppm"),
        )
        .filter(F.col("n") >= int(min_total))
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ob = sd / nd

    # readouts stay on the floor lattice (identical double trees on
    # both engines) — round() half-boundaries differ cross-engine
    # when a ppm sum divides n to an exact half (seen live at sf0.1)
    def _row_ppm(col: str):
        return F.floor(F.col(col).cast("double") / nd) / F.lit(1e6)

    return agg.select(
        "key",
        "n",
        "s",
        "rel_ppm",
        "res_ppm",
        "brier_ppm",
        _row_ppm("rel_ppm").alias("reliability"),
        _row_ppm("res_ppm").alias("resolution"),
        (
            F.floor(F.lit(1e6) * (ob * (F.lit(1.0) - ob))) / F.lit(1e6)
        ).alias("uncertainty"),
        _row_ppm("brier_ppm").alias("brier"),
    )


def hourly_error_brier(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
    outcome_type: str = "error",
) -> DataFrame:
    """Brier decomposition of the global hourly error-rate forecast
    per user over the events shape."""
    return climatology_brier(
        df.select(
            F.col(key).alias("key"),
            F.hour(ts).alias("stratum"),
            (F.col(event_type) == outcome_type).alias("outcome"),
        ),
    )
