"""PAA + SAX: piecewise aggregate approximation and symbolic words.

The iSAX-family representation (Lin et al., DMKD 2007; Shieh & Keogh,
KDD 2008): z-normalize each series, average it down to ``segments``
equal-count pieces (PAA), then map each piece to a letter by Gaussian
quantile breakpoints. SAX words are the standard index key for
similarity search / motif grouping over huge series collections — the
equi-joinable "shingle" of time series, the same role MinHash bands
play for documents (operators/dedup.py).

Everything here is declarative window + groupBy algebra — one shuffle
on the series key, partial aggregation, whole-stage codegen, no Python
UDF. Segment assignment uses integer arithmetic (floor(idx * segments
/ n)), so the split is engine-exact; PAA values are quantized to six
decimals BEFORE symbol comparison so breakpoint assignment is stable
across engines (the same device as operators/lttb.py's quantized
argmax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Gaussian N(0,1) quantile breakpoints, the published SAX tables
# (values quantized to 2dp like the original paper's table 3 — the
# oracle SQL embeds the SAME constants, which is all parity needs)
BREAKPOINTS: dict[int, list[float]] = {
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
}

_ALPHABET = "abcdefgh"


def paa(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    segments: int = 8,
    min_points: int | None = None,
) -> DataFrame:
    """(key, seg, n_pts, paa): per-key z-normalized piecewise means.

    Rows are ranked in (ts, value) order; point i of an n-point series
    lands in segment floor(i * segments / n) — exact integer split, no
    float boundary. Series shorter than ``min_points`` (default:
    ``segments``) are dropped (a segment would be empty / PAA
    meaningless). Zero-variance series are dropped (z-norm undefined).
    """
    mp = segments if min_points is None else min_points
    wk = Window.partitionBy(key)
    wo = wk.orderBy(ts, value)
    z = (F.col(value) - F.avg(value).over(wk)) / F.stddev_samp(value).over(wk)
    ranked = (
        df.where(F.col(value).isNotNull())
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_sd", F.stddev_samp(value).over(wk))
        .where((F.col("_n") >= mp) & (F.col("_sd") > 0))
        .withColumn("_i", F.row_number().over(wo) - 1)
        .withColumn("_z", z)
        .withColumn("seg", (F.col("_i") * segments / F.col("_n")).cast("int"))
    )
    return (
        ranked.groupBy(key, "seg")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.avg("_z"), 6).alias("paa"),
        )
    )


def _symbol_expr(col: str, alphabet: int):
    """CASE chain mapping a quantized PAA value to its letter; the
    oracle SQL is generated from the same table (sax_symbol_sql)."""
    bps = BREAKPOINTS[alphabet]
    expr = F.when(F.col(col) < bps[0], F.lit(_ALPHABET[0]))
    for i, b in enumerate(bps[1:], start=1):
        expr = expr.when(F.col(col) < b, F.lit(_ALPHABET[i]))
    return expr.otherwise(F.lit(_ALPHABET[len(bps)]))


def sax_symbol_sql(col: str, alphabet: int) -> str:
    """The DuckDB CASE expression twin of :func:`_symbol_expr`."""
    bps = BREAKPOINTS[alphabet]
    parts = [f"WHEN {col} < {bps[0]} THEN '{_ALPHABET[0]}'"]
    parts += [
        f"WHEN {col} < {b} THEN '{_ALPHABET[i]}'"
        for i, b in enumerate(bps[1:], start=1)
    ]
    return "CASE " + " ".join(parts) + f" ELSE '{_ALPHABET[len(bps)]}' END"


def series_vectors(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    segments: int = 8,
    alphabet: int = 4,
    min_points: int | None = None,
) -> DataFrame:
    """(key, vec, word): the PAA vector AND the SAX word per series in
    one pass — vec for distance computations (e.g. operators/dtw.py),
    word for candidate bucketing. One extra agg over the paa output."""
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"series_vectors: alphabet must be one of {sorted(BREAKPOINTS)}")
    p = paa(df, key, ts, value, segments, min_points)
    sym = p.withColumn("sym", _symbol_expr("paa", alphabet))
    ordered = F.array_sort(F.collect_list(F.struct("seg", "paa", "sym")))
    return sym.groupBy(key).agg(
        F.transform(ordered, lambda x: x["paa"]).alias("vec"),
        F.array_join(F.transform(ordered, lambda x: x["sym"]), "").alias("word"),
    )


def sax_words(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    segments: int = 8,
    alphabet: int = 4,
    min_points: int | None = None,
) -> DataFrame:
    """(key, word): the SAX word per series — the equi-join/group index
    key for whole-series similarity (identical words = candidate
    near-identical shapes, verified downstream like LSH candidates)."""
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"sax_words: alphabet must be one of {sorted(BREAKPOINTS)}")
    p = paa(df, key, ts, value, segments, min_points)
    sym = p.withColumn("sym", _symbol_expr("paa", alphabet))
    return (
        sym.groupBy(key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("word")
        )
    )
