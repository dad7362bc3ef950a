"""Reciprocal-rank fusion of two retrieval systems.

RRF (Cormack, Clarke & Buettcher, SIGIR'09 — public formula) combines
ranked lists without score calibration:

    rrf(d) = sum_systems 1 / (k + rank_system(d))

with the conventional k = 60. It is the standard way to fuse lexical
(BM25) and dense (embedding-cosine) retrieval in a hybrid-search
pipeline — exactly the two systems this engine already ships
(operators/lexical.bm25_topk, operators/similarity.cosine_topk), so
the fusion is a pure DataFrame combine: one full-outer equi-join on
(query, candidate), a fixed two-term score expression (no float
aggregation — the sum has a constant operand order, so both engines
evaluate the identical double tree), and one per-query window for the
fused rank. No new shuffle beyond the join: both inputs arrive
already keyed by query.

Candidates appearing in only one list contribute a single term (the
other coalesces to 0), the textbook truncated-list behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k_const: int = 60,
    topk: int = 5,
) -> DataFrame:
    """Fuse two (query_id, cand_id, rank) frames into the RRF top-k.

    Returns (query_id, rank, cand_id, rrf_u6) — the fused score on the
    floor-1e6 lattice (tie-free vs round()'s half modes). Ties in the
    fused score break on cand_id ASC, so the output is deterministic.
    """
    kc = float(k_const)
    an = a.select("query_id", "cand_id", F.col("rank").alias("rank_a"))
    bn = b.select("query_id", "cand_id", F.col("rank").alias("rank_b"))
    fused = an.join(bn, ["query_id", "cand_id"], "outer").select(
        "query_id",
        "cand_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(kc) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(kc) + F.col("rank_b")), F.lit(0.0))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(topk))
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "cand_id",
            F.floor(F.col("score") * 1e6).cast("long").alias("rrf_u6"),
        )
    )
