"""Lexical-richness indices per document — Yule's K (Yule 1944),
Herdan's C (1960), Guiraud's R (1954) and Honoré's H (1979), the
vocabulary-concentration layer missing from readability (which sees
sentence/syllable shape) and text.quality_features (surface ratios):
these ask how REPEATED the vocabulary is, the classic repetitiveness
/ template-detection signal for corpus curation.

All four are fixed trees over three exact integers derived from the
shared curation tokenizer (text._tokens — the same scheme every token
operator and oracle mirrors):

    N   = token count,
    V   = distinct-type count,
    V1  = hapax count (types occurring exactly once),
    S2  = sum over types of m^2 (m = type frequency)

    K = 10^4 * (S2 - N) / N^2          (0 for all-distinct text)
    C = ln V / ln N                    (N >= 2)
    R = V / sqrt(N)
    H = 100 ln N / (1 - V1/V)          (NULL when V1 = V: the
                                        all-hapax text puts H at its
                                        +inf pole)

Exactness: S2 is accumulated WITHOUT a per-(doc, token) shuffle via
the telescoping identity sum_types m^2 = sum_i (2*r_i - 1), where r_i
is the running occurrence index of token i inside the doc's SORTED
token array — a single JVM-side F.aggregate fold over
sort_array(tokens) carrying (prev, run, S2, V, V1). The DuckDB oracle
takes the orthodox unnest + GROUP BY route; both land on the same
integers, so the four double trees (round 6, signed-zero normalized)
agree bit-for-bit.

Plan shape (the 100 TB argument): pure column expressions — ONE scan,
ZERO shuffles, ZERO joins, ZERO Python UDFs (readability's class).
The fold is O(L log L) per doc for the sort; token arrays are
doc-sized, never collected. Token-free documents drop (guarded
HAVING-style filter, mirrored in the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens


def _fold_counts(tokens_sorted: Column) -> Column:
    """Fold (prev, run, sm2, v, v1) over a sorted token array.

    sm2 accumulates 2*run-1 at every token (the m^2 telescope); v
    counts run starts; v1 counts runs that CLOSE at length one, with
    the final open run settled in the finish lambda.
    """
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("sm2"),
        zero.alias("v"),
        zero.alias("v1"),
    )

    def merge(acc: Column, t: Column) -> Column:
        same = (acc["v"] > 0) & (t == acc["prev"])
        new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            t.alias("prev"),
            new_run.alias("run"),
            (acc["sm2"] + 2 * new_run - 1).alias("sm2"),
            (acc["v"] + F.when(same, 0).otherwise(1)).alias("v"),
            (
                acc["v1"]
                + F.when(~same & (acc["v"] > 0) & (acc["run"] == 1), 1)
                .otherwise(0)
            ).alias("v1"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            acc["sm2"].alias("sm2"),
            acc["v"].alias("v"),
            (
                acc["v1"] + F.when((acc["v"] > 0) & (acc["run"] == 1), 1)
                .otherwise(0)
            ).alias("v1"),
        )

    return F.aggregate(tokens_sorted, init, merge, finish)


def lexical_richness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Yule's K, Herdan's C, Guiraud's R, Honoré's H.

    Returns (doc_id, n_tokens, v_types, v1_hapax, sum_m2, yules_k,
    herdan_c, guiraud_r, honore_h); token-free documents drop; C and
    H are NULL at their single-token / all-hapax poles.
    """
    toks = F.sort_array(_tokens(F.col(text_col)))
    st = _fold_counts(toks)
    base = df.select(
        F.col(id_col),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        st["v"].alias("v_types"),
        st["v1"].alias("v1_hapax"),
        st["sm2"].alias("sum_m2"),
    ).filter(F.col("n_tokens") > 0)

    n_d = F.col("n_tokens").cast("double")
    v_d = F.col("v_types").cast("double")
    v1_d = F.col("v1_hapax").cast("double")
    k = F.lit(1e4) * (F.col("sum_m2") - F.col("n_tokens")).cast("double") / (
        n_d * n_d
    )
    c = F.when(
        F.col("n_tokens") >= 2, F.round(F.log(v_d) / F.log(n_d), 6) + F.lit(0.0)
    )
    r = F.round(v_d / F.sqrt(n_d), 6) + F.lit(0.0)
    h = F.when(
        (F.col("n_tokens") >= 2) & (F.col("v1_hapax") < F.col("v_types")),
        F.round(
            F.lit(100.0) * F.log(n_d) / (F.lit(1.0) - v1_d / v_d), 6
        )
        + F.lit(0.0),
    )
    return base.select(
        id_col,
        "n_tokens",
        "v_types",
        "v1_hapax",
        "sum_m2",
        (F.round(k, 6) + F.lit(0.0)).alias("yules_k"),
        c.alias("herdan_c"),
        r.alias("guiraud_r"),
        h.alias("honore_h"),
    )
