"""Page-Hinkley mean-drift detector per key (Page 1954, Hinkley
1971) — the sequential alarm form of the changepoint family: pettitt
and mood_cp LOCATE a change after the fact, cusum accumulates against
a FIXED reference; Page-Hinkley tests each new point against the
RUNNING mean, which is what an online monitor actually does, and is
the form that twins cleanly into streaming (streaming/ph_stream.py,
twin #30).

Protocol: per key, ticks dedup to (us, max cents) (the var_backtest
rule), index t = 1..n in time order, A_t = cumulative cents sum. The
increment against the running mean, with drift allowance ``delta``
cents, is quantized onto the micro-cent lattice per step:

    q_t = floor(1e6 * (t*c_t - A_t) / t) - delta * 1e6

(the (t*c_t - A_t)/t division is ONE double op over exact integers —
the hac floor discipline; the 1e-6 grain is far below any practical
lambda). Then, all in exact DECIMAL(38,0):

    PH_t  = sum_{s<=t} q_s          (the Page-Hinkley statistic)
    min_t = min_{s<=t} PH_s
    alarm at t  iff  PH_t - min_t > lambda * 1e6

Emits one row PER ALARM TICK — (key, us, t, excess_u) with the exact
micro-cent excess — so the streaming twin's fire-as-you-go output is
bit-equal to this batch replay by construction.

Envelope: |q_t| <= max|c| * 1e6, so PH over 1e9 ticks at 1e8 cents
reaches 1e23 — comfortably inside decimal(38,0)/HUGEINT.

Plan shape (100 TB): ONE scan, the (key, us) dedup agg, then index /
cumsum / running-min windows all on hashpartitioning(key). No join,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def page_hinkley(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    delta_cents: int = 0,
    lambda_cents: int = 500,
) -> DataFrame:
    """Per-key Page-Hinkley alarms for UPWARD mean drift.

    Returns one row per alarm tick: (key, us, t, ph_u, min_u,
    excess_u) — the statistic, running minimum and excess in exact
    micro-cents. ``delta_cents`` is the tolerated drift per step,
    ``lambda_cents`` the alarm threshold."""
    dlt = int(delta_cents) * 1_000_000
    lam = int(lambda_cents) * 1_000_000

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
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = ticks.select(
        "key",
        "us",
        F.row_number().over(wo).alias("t"),
        F.sum("c").over(wcum).alias("a"),
        "c",
    )
    num = (F.col("t").cast(DEC) * F.col("c") - F.col("a")).cast(DEC)
    q = (
        F.floor(num.cast("double") * F.lit(1e6) / F.col("t").cast("double"))
        .cast(DEC)
        - F.lit(dlt)
    )
    stepped = base.select("key", "us", "t", q.alias("q"))
    ph = F.sum("q").over(wcum).alias("ph")
    cur = stepped.select("key", "us", "t", ph)
    out = cur.select(
        "key",
        "us",
        "t",
        "ph",
        F.min("ph").over(wcum).alias("mn"),
    )
    excess = F.col("ph") - F.col("mn")
    return out.filter(excess > lam).select(
        "key",
        "us",
        F.col("t").cast("long").alias("t"),
        F.col("ph").cast("long").alias("ph_u"),
        F.col("mn").cast("long").alias("min_u"),
        excess.cast("long").alias("excess_u"),
    )
