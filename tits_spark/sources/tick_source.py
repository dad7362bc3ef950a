"""Tick-stream text source/sink (SURVEY.md §2.1 S1/S2/S5).

The reference consumes a fixed positional TSV `sec.nsec \\t ECN \\t bid
\\t ask` line-by-line from stdin, silently dropping malformed lines
(ref:guess_lag.c:107-226: 21-char time field validated by position, key
must hash non-zero, absent price fields never reach a book). Spark
re-expression: text lines -> strict regex/spliti column parse -> typed
(ts, venue, bid, ask); malformed rows drop out via NULL filtering —
exactly DROPMALFORMED semantics, no Python.

Nanosecond caveat: Spark timestamps are µs; the full ns value is kept in
``ts_ns`` (long) alongside the truncated µs ``ts`` (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: sec.nsec \t ECN \t bid \t ask — seconds field width-validated like the
#: reference's position check (line[20] == '\t' with a 10.9 layout)
_LINE_RE = r"^(\d{10})\.(\d{9})\t([^\t]+)\t([0-9.]*)\t([0-9.]*)$"


def parse_ticks(lines: DataFrame, col: str = "value") -> DataFrame:
    """(line: string) -> (ts timestamp, ts_ns long, venue string,
    bid decimal, ask decimal); malformed lines are dropped silently."""
    m = F.regexp_extract(F.col(col), _LINE_RE, 0)
    sec = F.regexp_extract(F.col(col), _LINE_RE, 1).cast("long")
    nsec = F.regexp_extract(F.col(col), _LINE_RE, 2).cast("long")
    venue = F.regexp_extract(F.col(col), _LINE_RE, 3)
    bid = F.regexp_extract(F.col(col), _LINE_RE, 4)
    ask = F.regexp_extract(F.col(col), _LINE_RE, 5)
    dec = "decimal(18,9)"
    out = (
        lines.select(
            sec.alias("sec"),
            nsec.alias("nsec"),
            venue.alias("venue"),
            F.when(bid != "", bid.cast(dec)).alias("bid"),
            F.when(ask != "", ask.cast(dec)).alias("ask"),
            (m != "").alias("_ok"),
        )
        .filter(F.col("_ok") & (F.col("sec") > 0) & (F.col("venue") != ""))
        .drop("_ok")
    )
    ts_ns = out["sec"] * F.lit(1_000_000_000) + out["nsec"]
    # µs from integer arithmetic: ts_ns/1000 would round-trip through a
    # double (52-bit mantissa) and corrupt the low µs digits at 1e18 ns
    ts_us = out["sec"] * F.lit(1_000_000) + (out["nsec"] / 1000).cast("long")
    return out.select(
        F.timestamp_micros(ts_us).alias("ts"),
        ts_ns.alias("ts_ns"),
        "venue",
        "bid",
        "ask",
    )


def read_tick_file(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Batch or streaming read of a tick TSV file/directory."""
    reader = spark.readStream if streaming else spark.read
    return parse_ticks(reader.text(path))


def format_ticks(quotes: DataFrame) -> DataFrame:
    """Inverse of parse_ticks: (ts, venue, bid, ask) -> one `value`
    string column in the reference's stdin layout
    ``sec.nsec\\tECN\\tbid\\task`` (absent prices -> empty fields, as the
    reference emitters leave them). Lets any quotes table be written as
    a tick TSV the reference executable (or this repo's jobs) can read."""
    us = F.unix_micros(F.col("ts"))
    sec = F.format_string("%010d", (us / 1_000_000).cast("long"))
    nsec = F.format_string("%09d", (us % 1_000_000).cast("long") * 1000)
    px = lambda c: F.coalesce(  # noqa: E731
        F.when(F.col(c).isNotNull(), F.format_string("%.4f", F.col(c).cast("double"))),
        F.lit(""),
    )
    return quotes.select(
        F.concat_ws(
            "\t",
            F.concat(sec, F.lit("."), nsec),
            F.col("venue"),
            px("bid"),
            px("ask"),
        ).alias("value")
    )


def write_tick_tsv(quotes: DataFrame, path: str) -> None:
    """Write a quotes table as a reference-format tick TSV dataset."""
    format_ticks(quotes).write.mode("overwrite").text(path)


def write_correlogram_tsv(df: DataFrame, path: str) -> None:
    """TSV sink for correlogram / best-lag rows (ref:guess_lag.c:302-315
    prints tab-separated rows to stdout; ours lands them as a TSV
    dataset the rest of the toolchain can re-read)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", True).csv(path)
