"""Edit-distance (Levenshtein) near-duplicate pairs, shingle-blocked.

The curation family (`dedup.py`) already finds near-dups by set
similarity (Jaccard / MinHash / SimHash); edit distance is the
complementary SEQUENCE similarity — it catches small in-place edits
(typo fixes, template variable substitutions) that keep character order
but shift every downstream n-gram.  All-pairs Levenshtein is O(n²·L²)
and unthinkable at corpus scale, so candidates are blocked exactly like
`ngram_jaccard_pairs`: docs must share >= ``min_shared`` rare
16-character shingles (doc-frequency-capped against boilerplate), then
a cheap length-band prefilter (|len_a − len_b| > d implies distance
> d), and only the surviving pairs pay the DP — Spark's banded
``levenshtein(a, b, threshold)`` at that, which abandons a row early
once the band exceeds ``max_dist``.

Engine parity note: Spark's levenshtein counts CODEPOINTS while
DuckDB's counts BYTES, so the operator is gated to ASCII-clean texts
(``octet_length = char_length``) where the two definitions coincide —
the gate is mirrored in the oracle, and non-ASCII docs are simply not
scored rather than scored differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.operators.dedup import char_shingles


def levenshtein_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 40,
    n: int = 16,
    max_doc_freq: int = 20,
    min_shared: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs with ``levenshtein <= max_dist``.

    Returns (id_a, id_b, len_a, len_b, lev) with id_a < id_b; only
    ASCII-clean texts participate (see module docstring).
    """
    txt = F.col(text_col)
    ascii_docs = df.where(F.octet_length(txt) == F.length(txt)).select(
        id_col, text_col
    )
    sh = char_shingles(ascii_docs, id_col, text_col, n)
    blacklist = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > max_doc_freq)
        .select("shingle")
    )
    sh = sh.join(blacklist, "shingle", "left_anti")
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
        .select("id_a", "id_b")
    )
    ta = ascii_docs.select(
        F.col(id_col).alias("id_a"),
        txt.alias("_ta"),
        F.length(txt).cast("long").alias("len_a"),
    )
    tb = ascii_docs.select(
        F.col(id_col).alias("id_b"),
        txt.alias("_tb"),
        F.length(txt).cast("long").alias("len_b"),
    )
    scored = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        # necessary condition first: a length gap > max_dist already
        # implies distance > max_dist, no DP needed
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        # banded DP: threshold variant abandons rows once the diagonal
        # band exceeds max_dist (returns -1 above threshold)
        .withColumn(
            "lev", F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist).cast("long")
        )
        .filter(F.col("lev") >= 0)
    )
    return scored.select("id_a", "id_b", "len_a", "len_b", "lev")
