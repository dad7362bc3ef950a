"""Good-Turing frequency-of-frequencies over the corpus vocabulary
(Good 1953) — how much probability mass belongs to words we have
NEVER seen, and what is a once-seen word's adjusted frequency? The
coverage question a tokenizer/vocab pipeline asks before freezing a
vocab (vocab.py picks the top-k; this says what the tail it dropped
is worth), and the classic smoothing layer over richness.py's hapax
counts (its V1/N IS the Good-Turing unseen-mass estimate P0).

From the shared-tokenizer term counts, the frequency-of-frequencies
table n_r = #{terms seen exactly r times} gives, for each low r:

    r* = (r + 1) * n_{r+1} / n_r      (Turing-adjusted count)
    p0 = n_1 / N                      (unseen probability mass)

Emitted for the ``max_r`` LOWEST OCCUPIED counts (for a natural
corpus that is r = 1..10, the regime where GT is meaningful; a
synthetic dense vocabulary may start higher — the rank rule keeps
the table non-degenerate either way): (r, n_r, n_next, r_star, p_r,
p0, n_tokens, v_types) where p_r = r*/N is the adjusted per-term
probability at count r and n_next = n_{r+1} (0 when count r+1 is
unoccupied — the sparse-tail pole where r* is NULL and raw r
stands).

Exactness: n_r, n_{r+1}, N, V are exact BIGINTs; r_star and the two
probabilities are single double trees over them, round 6 (r_star
NULL when n_{r+1} = 0 — the sparse-tail pole where raw r stands).

Plan shape (100 TB): explode -> (term) count hash agg (ONE shuffle
on term, map-side combined) -> (r) histogram hash agg (<= distinct
counts rows, tiny) -> a lead window and broadcast of the 1-row
totals onto the bounded r-frame. No cartesian beyond that broadcast,
no Python, no global window on unbounded data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens


def good_turing(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 10,
) -> DataFrame:
    """Corpus Good-Turing table for term counts r = 1..``max_r``.

    Returns (r, n_r, n_next, r_star, p_r, p0, n_tokens, v_types)."""
    mr = max(int(max_r), 1)
    terms = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    fof = terms.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("n_r"))
        .cast("long")
        .alias("n_tokens"),
        F.sum("n_r").cast("long").alias("v_types"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
        .cast("long")
        .alias("n1"),
    )
    # bounded-global-window: frame = the frequency-of-frequencies
    # table, one row per distinct term COUNT (<= a few thousand for
    # any corpus; counts, not terms)
    wlead = Window.orderBy("r")
    chain = fof.select(
        "r",
        "n_r",
        F.when(F.lead("r").over(wlead) == F.col("r") + 1,
               F.lead("n_r").over(wlead))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_next"),
        F.row_number().over(wlead).alias("_rk"),
    ).filter(F.col("_rk") <= mr).drop("_rk")
    out = chain.crossJoin(F.broadcast(tot))
    n_d = F.col("n_tokens").cast("double")
    r_star = F.when(
        F.col("n_next") > 0,
        (F.col("r") + 1).cast("double")
        * F.col("n_next").cast("double")
        / F.col("n_r").cast("double"),
    )
    return out.select(
        F.col("r").cast("long").alias("r"),
        F.col("n_r").cast("long").alias("n_r"),
        "n_next",
        (F.round(r_star, 6) + F.lit(0.0)).alias("r_star"),
        (F.round(r_star / n_d, 9) + F.lit(0.0)).alias("p_r"),
        (F.round(F.col("n1").cast("double") / n_d, 9) + F.lit(0.0)).alias(
            "p0"
        ),
        "n_tokens",
        "v_types",
    ).orderBy("r")
