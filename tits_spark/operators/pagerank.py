"""Integer-exact PageRank over a co-activity graph, fixed iterations.

PageRank (Brin & Page 1998) on user graphs is the standard importance
ranking in behavioral pipelines.  Two Spark-first choices here:

1. **The graph is built by bucketed co-occurrence**, never all-pairs:
   users sharing an (event_type, hour) activity bucket are linked, and
   buckets larger than ``max_bucket`` are dropped before the self-join
   (hot-bucket cap — the same quadratic-blowup guard as
   `dedup.ngram_jaccard_pairs`; a busy hour links everyone to everyone
   and carries no signal).  Edges are symmetrized, so there are no
   dangling nodes by construction.

2. **All arithmetic is scaled-integer**, so a DuckDB oracle matches
   bit-for-bit and executor partitioning cannot perturb results:
   ranks start at SCALE = 10^12 and update as

       r' = round(0.15 * SCALE) + sum over in-nbrs (85 * r) div (100 * outdeg)

   — one integer ``div`` per edge, BIGINT sums (max ~10^12 * degree,
   far under 2^63).  Float PageRank would differ across engines in the
   last ulp per partial-sum order; integer PageRank cannot.

Fixed ``n_iter`` keeps the plan static and resumable; each iteration is
one broadcast-or-shuffle hash join (ranks are |V| rows, edges |E|) plus
one aggregation — the classic Pregel superstep expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

SCALE = 1_000_000_000_000


def coactivity_edges(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    bucket_us: int = 3_600_000_000,
    max_bucket: int = 10,
) -> DataFrame:
    """Symmetric distinct edges between keys sharing an
    (event_type, time-bucket) activity cell, hot cells dropped."""
    cells = (
        df.select(
            F.col(key).alias("_k"),
            F.col(event_col).alias("_et"),
            epoch_us(ts).alias("_u"),
        )
        .select("_k", "_et", F.expr(f"_u div {int(bucket_us)}").alias("_b"))
        .distinct()
    )
    counts = cells.groupBy("_et", "_b").agg(F.count(F.lit(1)).alias("_n"))
    small = counts.filter(F.col("_n") <= max_bucket).select("_et", "_b")
    cells = cells.join(small, ["_et", "_b"])
    a = cells.select(F.col("_k").alias("src"), "_et", "_b")
    b = cells.select(F.col("_k").alias("dst"), "_et", "_b")
    half = (
        a.join(b, ["_et", "_b"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return half.unionAll(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Scaled-integer PageRank over a symmetric edge list (``src``,
    ``dst``); returns (key, outdeg, rank) with rank on the 10^12 scale.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    # contribution denominator is constant per source across iterations
    g = edges.join(deg, "src").select("src", "dst", "outdeg")
    base = round(0.15 * SCALE)
    ranks = deg.select(
        F.col("src").alias("key"), F.lit(SCALE).cast("long").alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            g.join(ranks, g.src == ranks.key)
            .select(
                F.col("dst").alias("key"),
                F.expr(f"({damping_pct} * rank) div (100 * outdeg)").alias("_c"),
            )
            .groupBy("key")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = contrib.select(
            "key", (F.lit(base) + F.col("_in")).cast("long").alias("rank")
        )
    return ranks.join(
        deg.select(F.col("src").alias("key"), "outdeg"), "key"
    ).select("key", "outdeg", "rank")
