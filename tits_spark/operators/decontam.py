"""Benchmark decontamination for training corpora: flag/remove training
documents that share any word n-gram with an evaluation/benchmark set.

This is the standard n-gram-overlap decontamination used by public LLM
training pipelines (GPT-3 appendix C uses 13-gram overlap; Llama and
The Pile use similar schemes). The training side is the 100 TB corpus;
the benchmark side is small (eval suites are at most millions of
n-grams), which fixes the physical plan:

 - tokenize + n-gram generation are pure higher-order column
   expressions (``transform`` over a ``sequence``) — map-only,
   codegen'd, no Python and no shuffle;
 - the benchmark n-gram set is built once, de-duplicated, and
   **broadcast**, so the corpus-side probe is a broadcast hash join —
   the 100 TB side is never shuffled;
 - the only shuffle in the reporting path is the final per-doc
   aggregation of match counts, which is partially aggregated map-side.

Tokenization is deliberately lowercased-alphanumeric (the common
normalization) and identical to the ANSI-SQL form the DuckDB oracle
runs, so the gate checks exact per-doc hit counts, not just flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# canonical tokenizer + n-gram builder live in operators/text.py (the
# shared text-utility module); re-exported here for compatibility
from tits_spark.operators.text import _tokens, word_ngrams_col  # noqa: F401


def word_ngrams(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded distinct word n-grams per document: (<id_col>, ngram).

    Distinct within doc so a gram repeated inside one document counts
    once toward its contamination score (and the explode volume stays
    bounded by unique grams). Routed through ``ensure_min_parallelism``
    (no-op at scale) so the CPU-amplifying explode never runs on fewer
    cores than the cluster offers when the corpus is small/few-file.
    """
    from tits_spark.operators.skew import ensure_min_parallelism

    return (
        ensure_min_parallelism(df)
        .select(id_col, F.explode(word_ngrams_col(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-training-doc contamination report vs a benchmark set.

    Returns every training doc with ``n_hits`` = number of distinct
    word n-grams it shares with ANY benchmark document and
    ``contaminated`` = n_hits > 0.

    Plan shape at 100 TB: benchmark grams (small) are de-duplicated and
    broadcast; the corpus side is a map-only n-gram explode probed
    against the broadcast set; one hash aggregation keyed by doc id
    produces the counts. No corpus-side shuffle before the agg, no
    cartesian anywhere.
    """
    bench_grams = (
        benchmark.select(F.explode(word_ngrams_col(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    train_grams = word_ngrams(train, n, id_col, text_col)
    hits = (
        train_grams.join(F.broadcast(bench_grams), "ngram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training rows with contaminated documents removed (left_anti
    against the flagged id set — the corpus is filtered, never
    shuffled).

    Builds the flagged-id set directly (corpus grams semi-joined to the
    broadcast benchmark grams, distinct ids) rather than routing
    through :func:`contamination_report`: the report's all-docs spine
    (``train.select(id).join(hits, 'left')``) is a SECOND full corpus
    scan that the contaminated-only filter would immediately discard —
    an entire wasted pass at 100 TB.
    """
    bench_grams = (
        benchmark.select(F.explode(word_ngrams_col(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    flagged = (
        word_ngrams(train, n, id_col, text_col)
        .join(F.broadcast(bench_grams), "ngram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")
