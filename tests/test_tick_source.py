"""Tick TSV parser: valid lines typed, malformed lines dropped silently
(reference parity, ref:guess_lag.c:107-226)."""

from __future__ import annotations

from decimal import Decimal

from tits_spark.sources.tick_source import parse_ticks, write_correlogram_tsv


def test_parse_ticks(spark, tmp_path):
    lines = [
        "1455798000.123456789\tNYSE\t12.34\t12.36",   # full quote
        "1455798001.000000001\tBATS\t\t12.37",        # ask only
        "1455798002.500000000\tNYSE\t12.35\t",        # bid only
        "not a tick line",                            # garbage
        "1455798003.1\tNYSE\t1\t2",                   # bad nsec width
        "0000000000.000000000\tNYSE\t1\t2",           # zero time (ref drops)
        "1455798004.000000000\t\t1\t2",               # empty venue
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_ticks(df).collect()
    assert len(out) == 3
    r0 = out[0]
    assert r0["venue"] == "NYSE"
    assert r0["ts_ns"] == 1455798000123456789
    assert r0["bid"] == Decimal("12.340000000")
    assert r0["ask"] == Decimal("12.360000000")
    assert r0["ts"].microsecond == 123456  # ns truncated to µs in ts
    assert out[1]["bid"] is None and out[1]["ask"] == Decimal("12.370000000")
    assert out[2]["ask"] is None


def test_tick_file_roundtrip_through_guess_lag_format(spark, tmp_path):
    # synthesize lines, parse, feed melt_books — absent sides never book
    from pyspark.sql import functions as F

    from tits_spark.operators.guess_lag import melt_books

    lines = [
        f"14557980{i:02d}.000000000\tLEAD\t{10 + i * 0.01:.2f}\t{10.02 + i * 0.01:.2f}"
        for i in range(10)
    ] + ["1455798099.000000000\tLEAD\t\t11.50"]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_ticks(df).select(
        "ts", "venue", F.col("bid").cast("double"), F.col("ask").cast("double")
    )
    books = melt_books(parsed)
    counts = {r["side"]: r["n"] for r in books.groupBy("side").agg(F.count("*").alias("n")).collect()}
    assert counts == {"BID": 10, "ASK": 11}


def test_correlogram_tsv_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("BID", "A", "B", -0.01, 0.5), ("BID", "A", "B", 0.0, 0.9)],
        "side string, key1 string, key2 string, lag_time double, xcf double",
    )
    p = str(tmp_path / "corr")
    write_correlogram_tsv(df, p)
    back = spark.read.option("sep", "\t").option("header", True).csv(p)
    assert back.count() == 2
    assert set(back.columns) == {"side", "key1", "key2", "lag_time", "xcf"}
