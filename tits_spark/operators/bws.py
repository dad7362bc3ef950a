"""Baumgartner–Weiß–Schindler two-sample test per key (Baumgartner,
Weiß & Schindler, Biometrics 1998 — public rank formula): the
variance-WEIGHTED EDF distance. Where cvm integrates the squared
rank displacement uniformly, BWS divides each displacement by its
binomial variance — up-weighting the DISTRIBUTION TAILS where the
EDF gap is hardest to move — which is exactly where heavy-tailed
value/latency corpora differ first. Completes the two-sample ladder:
MW (location), lepage/cucconi (location-scale), ks/cvm (uniform
EDF), BWS (tail-weighted EDF).

With combined ranks R_i of the a-sample (sizes n = own, m = other,
N = n + m) and within-sample index i (derived from R itself — cvm's
assignment-consistency device):

    B_X = (1/n) sum_i  (R_i - N/n * i)^2
                      / ( i/(n+1) * (1 - i/(n+1)) * m*N/n )
    B   = (B_X + B_Y) / 2        (B_Y symmetric on the b-sample)

Cleared to one exact-integer ratio per row:

    num_i = (n*R_i - N*i)^2 * (n+1)^2       (decimal(38,0))
    den_i = n^2 * i * (n+1-i) * m * N       (decimal(38,0))

Exactness: each per-row term num/den is a rational whose naive
double sum would be partial-order dependent, so every term is
QUANTIZED onto the 1e-6 lattice before summation (the logrank
per-time floor device): q_i = floor(1e6 * num/den) with the floor
taken over the identical double tree on both engines; the sums are
then exact DECIMAL(38,0) and B is DEFINED on the quantized lattice
all the way out: bws_micro = floor((sum_a q + sum_b q) / 2) is an
exact BIGINT and bws_b = bws_micro / 1e6 is one exact-int-to-double
division — there is NO round() call, because (qa+qb)/2e6 lands
exactly on the 1e-6 half boundary whenever qa+qb is odd, where
Spark's decimal-string HALF_UP and DuckDB's numeric rounding
genuinely disagree (measured: 3 boundary keys at sf0.01). A 1e-6
grain is far below any decision boundary of the B distribution
(critical value ~ 2.5 at 5%).

Plan shape (100 TB): one scan -> one (key)-window rank -> one
(key, label)-window rank over the rank (same hash(key) exchange
family) -> one hash agg. No joins, no Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def bws_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key BWS B between rows flagged ``is_a`` and the rest.
    Returns (key, n_a, n_b, bq_a, bq_b, bws_micro, bws_b); keys
    with either sample below ``min_each`` drop."""
    me = max(int(min_each), 2)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    w_all = Window.partitionBy("key").orderBy("c", "us", "a")
    wk = Window.partitionBy("key")
    w_lab = Window.partitionBy("key", "a").orderBy("r")
    wka = Window.partitionBy("key", "a")
    ranked = base.select(
        "key",
        "a",
        F.row_number().over(w_all).alias("r"),
        F.count(F.lit(1)).over(wk).alias("nn"),
    ).select(
        "key",
        "a",
        "r",
        "nn",
        F.row_number().over(w_lab).alias("i"),
        F.count(F.lit(1)).over(wka).alias("no"),
    )
    n = F.col("no").cast(DEC)  # own-sample size
    m = (F.col("nn") - F.col("no")).cast(DEC)
    big = F.col("nn").cast(DEC)
    i = F.col("i").cast(DEC)
    r = F.col("r").cast(DEC)
    diff = n * r - big * i
    num = (diff * diff).cast(DEC) * ((n + 1) * (n + 1)).cast(DEC)
    den = (n * n * i * (n + 1 - i)).cast(DEC) * (m * big).cast(DEC)
    q = F.floor(
        F.lit(1_000_000.0) * num.cast("double") / den.cast("double")
    ).cast(DEC)
    agg = (
        ranked.groupBy("key")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(F.lit(1) - F.col("a")).cast("long").alias("n_b"),
            F.sum(F.when(F.col("a") == 1, q)).alias("_qa"),
            F.sum(F.when(F.col("a") == 0, q)).alias("_qb"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    # the 1/n prefix is already cleared into den's n^2, so
    # B_X = (sum q over a)/1e6, B = (B_X + B_Y)/2 — kept on the
    # micro lattice to the end (floor the odd half; no round())
    micro = F.floor(
        (F.col("_qa") + F.col("_qb")).cast("long") / F.lit(2)
    ).cast("long")
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("_qa").cast("long").alias("bq_a"),
        F.col("_qb").cast("long").alias("bq_b"),
        micro.alias("bws_micro"),
        (micro.cast("double") / F.lit(1_000_000.0)).alias("bws_b"),
    )
