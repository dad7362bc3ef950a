"""k-anonymity / l-diversity audit of an event table (Sweeney 2002;
Machanavajjhala et al. 2007) — the privacy-governance readout a
training-data pipeline runs before release: how small is the
smallest quasi-identifier equivalence class, what share of rows sit
in re-identifiable classes, and does any class expose a single
sensitive value?

Quasi-identifier here: (event_type, hour-of-day, value band) — the
(categorical, temporal, quantized-numeric) triple that mirrors the
classic (zip, birth-date, sex) shape on this schema; the band is a
fixed integer quantization (cents // band_cents), deterministic with
no global statistics. Sensitive attribute: the user id.

All surfaces exact integers over the bounded class frame (classes <=
|types| * 24 * bands — a lattice, not a row count):

    n_rows, n_classes, k_min  = min class size
    k_p50                     = copied order-statistic median class
                                size (rank (m+1)//2 over (size, QI))
    rows_small / pct_small_ppm = rows in classes with size < k_thresh
                                (ppm by ONE double division)
    l_min                     = min distinct sensitive values per
                                class (l-diversity floor)

Plan shape (100 TB): one hash agg raw -> class frame (map-side
combined; count_distinct(sensitive) is the only two-phase part),
then aggregates + one rank window over the BOUNDED class lattice.
No join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv


def k_anonymity_report(
    df: DataFrame,
    qi_type: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    sensitive: str = "user_id",
    band_cents: int = 1000,
    k_thresh: int = 5,
) -> DataFrame:
    """One-row k-anonymity / l-diversity report.

    Returns (n_rows, n_classes, k_min, k_p50, rows_small,
    pct_small_ppm, l_min)."""
    bc = max(int(band_cents), 1)
    kt = max(int(k_thresh), 2)
    classes = (
        df.select(
            F.col(qi_type).alias("qt"),
            F.hour(ts).alias("qh"),
            floordiv(
                F.round(F.col(value) * 100).cast("long"), bc
            ).alias("qb"),
            F.col(sensitive).alias("s"),
        )
        .groupBy("qt", "qh", "qb")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("s").alias("l"),
        )
    )
    # bounded-global-window: frame = the QI class lattice, <= |types|
    # * 24 * value bands rows — a capped grid, not data-sized
    wr = Window.orderBy("k", "qt", "qh", "qb")
    # bounded-global-window: same bounded class lattice
    wall = Window.partitionBy()
    ranked = classes.select(
        "k",
        "l",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    agg = ranked.agg(
        F.sum("k").cast("long").alias("n_rows"),
        F.max("m").cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("k_min"),
        F.max(
            F.when(
                F.col("rk")
                == F.greatest(floordiv(F.col("m") + 1, 2), F.lit(1)),
                F.col("k"),
            )
        ).cast("long").alias("k_p50"),
        F.coalesce(
            F.sum(F.when(F.col("k") < kt, F.col("k"))), F.lit(0)
        ).cast("long").alias("rows_small"),
        F.min("l").cast("long").alias("l_min"),
    )
    ppm = floordiv(
        F.col("rows_small") * F.lit(1_000_000), F.col("n_rows")
    )
    return agg.select(
        "n_rows",
        "n_classes",
        "k_min",
        "k_p50",
        "rows_small",
        ppm.alias("pct_small_ppm"),
        "l_min",
    )
