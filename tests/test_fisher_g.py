"""Fisher g: planted sinusoid vs white noise, share bounds, p-value
chain identity."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.correlate import perio_declarative

BASE = dt.datetime(2024, 1, 1)


def _fisher(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )
    out = perio_declarative(df, "key", "ts", "value", nw=8)
    pu = out.select(
        "key", F.round(F.round("power", 6) * 1e6).cast("long").alias("pu")
    )
    agg = pu.groupBy("key").agg(
        F.max("pu").alias("pmax"), F.sum("pu").alias("ptot")
    )
    return {
        r["key"]: (r["pmax"] / r["ptot"])
        for r in agg.collect()
        if r["ptot"] > 0
    }


def test_sinusoid_vs_noise(spark):
    rng = np.random.default_rng(61)
    n = 240
    ts = [BASE + dt.timedelta(hours=i) for i in range(n)]
    # frequency index 2 on the unit-rescaled span -> 3 full cycles
    sine = [50 + 40 * math.sin(2 * math.pi * 3 * i / (n - 1)) for i in range(n)]
    noise = rng.uniform(10, 90, size=n).tolist()
    rows = [("sine", t, v) for t, v in zip(ts, sine)]
    rows += [("noise", t, float(v)) for t, v in zip(ts, noise)]
    g = _fisher(spark, rows)
    assert g["sine"] > 0.9  # one dominant line
    assert g["noise"] < g["sine"]
    # p-value chain: 8 * (1-g)^7 is tiny for the sinusoid
    p = 8.0 * (1.0 - g["sine"]) ** 7
    assert p < 1e-4


def test_g_share_bounds(spark):
    rng = np.random.default_rng(67)
    rows = [
        ("a", BASE + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(rng.uniform(0, 100, size=120))
    ]
    g = _fisher(spark, rows)["a"]
    assert 1.0 / 8.0 <= g <= 1.0  # max share of 8 non-negative parts
