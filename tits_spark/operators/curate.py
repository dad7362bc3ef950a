"""End-to-end training-data curation pipeline: quality gate -> language
gate -> exact dedup -> MinHash-LSH near-dup removal, composed from the
individually oracle-verified operators in ``text`` and ``dedup``.

This is the pipeline shape a 100 TB pretraining-corpus pass actually
runs, with the filters ordered cheapest-first so each stage shrinks the
input of the next:

  1. quality/lang features are pure column expressions (codegen, no
     shuffle) and gate FIRST — the expensive dedup joins only ever see
     documents that could be kept;
  2. exact dedup is one hash groupBy over the survivors;
  3. near-dup candidates come from the banded MinHash-LSH equi-join
     (never all-pairs) over the remaining docs, verified by exact
     character-shingle Jaccard computed ONLY on the candidate pairs
     (shingles joined against the candidate list, so verification cost
     scales with candidates, not with corpus^2);
  4. the drop rule is the deterministic greedy: a doc is a near-dup if
     it is the larger id of any verified pair — every connected
     near-dup cluster keeps at least its smallest id.

Every stage decision is recorded per input document (``stage`` column),
so the whole pipeline is one deterministic relation: auditable, and
oracle-checkable in ANSI SQL (see ``__spark_entry__.oracle_sql()['curate']``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tits_spark.operators.dedup import char_shingles, minhash_lsh_pairs
from tits_spark.operators.text import lang_id, quality_features


def verify_jaccard_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.4,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact character-n-gram Jaccard for a given candidate-pair set
    (id_a, id_b): shingles are equi-joined against the candidate list,
    so cost is O(candidates x shingles-per-doc), not corpus^2.
    Returns the pairs with jaccard >= threshold.
    """
    sh = char_shingles(docs, id_col, text_col, n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    sh = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle").drop("df_")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    lang: str = "en",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 8,
    jaccard_threshold: float = 0.4,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Per-document curation decisions over the full input.

    Returns one row per input document:
      (<id_col>, quality, lang_pred, stage)
    where ``stage`` is the first gate the document fails —
    'quality' | 'lang' | 'exact_dup' | 'near_dup' — or 'kept'.
    """
    feat = lang_id(quality_features(df, text_col), text_col).select(
        id_col, text_col, F.round("quality", 6).alias("quality"), "lang_pred"
    )
    passes_q = F.col("quality") >= quality_min
    passes_l = F.col("lang_pred") == lang
    base = feat.filter(passes_q & passes_l).select(id_col, text_col)

    # exact dedup over the gated survivors: keeper = min id per text hash
    keeper = (
        base.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias("keeper_id"))
    )
    exact = base.join(keeper, F.md5(F.col(text_col)) == F.col("h")).select(
        id_col, text_col, (F.col(id_col) != F.col("keeper_id")).alias("is_exact_dup")
    )
    survivors = exact.filter(~F.col("is_exact_dup")).select(id_col, text_col)

    cands = minhash_lsh_pairs(
        survivors, id_col, text_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )
    near = verify_jaccard_pairs(
        cands, survivors, id_col, text_col,
        n=shingle_n, threshold=jaccard_threshold, max_doc_freq=max_doc_freq,
    )
    near_ids = near.select(F.col("id_b").alias(id_col)).distinct().withColumn(
        "is_near_dup", F.lit(True)
    )

    flags = (
        feat.join(exact.select(id_col, "is_exact_dup"), id_col, "left")
        .join(near_ids, id_col, "left")
    )
    stage = (
        F.when(~(F.col("quality") >= quality_min), F.lit("quality"))
        .when(F.col("lang_pred") != lang, F.lit("lang"))
        .when(F.col("is_exact_dup"), F.lit("exact_dup"))
        .when(F.col("is_near_dup"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return flags.select(id_col, "quality", "lang_pred", stage.alias("stage"))


def curate_summary(decisions: DataFrame) -> DataFrame:
    """Per-stage counts for the lineage/metrics log."""
    return decisions.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))
