"""Exact-substring deduplication (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022 — the ExactSubstr method).

Web corpora repeat long literal passages (licenses, boilerplate,
syndicated articles) across otherwise-distinct documents; document-level
near-dup (MinHash/SimHash, operators/dedup.py) keeps such documents and
the repeated passage trains verbatim. ExactSubstr removes every
duplicated token span of length >= L, keeping exactly one canonical
occurrence corpus-wide.

The reference implementation builds a monolithic suffix array — a
single-machine design that cannot shard to 100 TB. The relational
reformulation here gets the same spans with bounded shuffles:

 1. every length-L token window becomes an (doc_id, start, gram) row
    (map-only higher-order exprs, shared tokenizer);
 2. one hash aggregation keyed by gram finds duplicated grams and
    elects the canonical occurrence: min (doc_id, start) — a plain
    min over a struct, no window;
 3. occurrences join back (equi-join on gram); non-canonical rows of
    duplicated grams are removal spans [start, start+L-1];
 4. overlapping spans merge per doc with the gaps-and-islands window
    (running max of span ends), and tokens inside merged islands are
    dropped by a higher-order filter over the token array — the
    cleaned text is re-joined with single spaces.

A maximal duplicated passage of length M >= L yields M-L+1 overlapping
windows that merge back into one island, so removal is exactly the
passage (Lee et al. §3.2's span union, without the suffix array).

Scale notes (100 TB):
 - the shuffle is bounded by one row per token occurrence (step 2) and
   one row per occurrence of a *duplicated* gram (step 3) — no
   all-pairs term anywhere;
 - a pathological gram repeated k times corpus-wide contributes k rows,
   not k^2: candidates join the gram's canonical struct, not each
   other;
 - per-doc reconstruction state is inherently bounded: merged islands
   are disjoint and each covers >= L tokens, so a doc carries at most
   n_tokens / L islands — the collect_list can never exceed the doc's
   own (already-loaded) token count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.text import _tokens


def _window_grams(toks: Column, length: int) -> Column:
    """Array of (start, gram) structs for every length-``length`` token
    window; empty when the doc is shorter than ``length`` tokens."""
    m = F.size(toks) - F.lit(length - 1)
    grams = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.struct(
            i.alias("start"), F.concat_ws(" ", F.slice(toks, i, length)).alias("gram")
        ),
    )
    return F.when(m >= 1, grams).otherwise(
        F.array().cast("array<struct<start:int,gram:string>>")
    )


def duplicated_spans(
    df: DataFrame,
    length: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Merged removal islands per document: ``(id, span_start,
    span_end)`` (1-based inclusive token positions) covering every
    non-canonical occurrence of a duplicated length-``length`` window.

    Canonical = the occurrence with the smallest (doc_id, start); it is
    kept, all other occurrences of the same gram are removed.
    """
    from tits_spark.operators.skew import ensure_min_parallelism

    occ = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(_window_grams(_tokens(F.col(text_col)), length)).alias("w"),
    ).select("id", F.col("w.start").alias("start"), F.col("w.gram").alias("gram"))

    per_gram = occ.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("id", "start")).alias("canon"),
    )
    dup = per_gram.filter(F.col("n_occ") > 1)
    spans = (
        occ.join(dup, "gram")
        .filter(
            (F.col("id") != F.col("canon.id")) | (F.col("start") != F.col("canon.start"))
        )
        .select(
            "id",
            F.col("start").alias("s"),
            (F.col("start") + F.lit(length - 1)).alias("e"),
        )
    )
    # gaps-and-islands: a span starts a new island iff it begins after
    # the running max end of all earlier spans (per doc, ordered by s)
    w = Window.partitionBy("id").orderBy("s", "e")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    islands = (
        spans.withColumn("prev_max_e", F.max("e").over(wprev))
        .withColumn(
            "new_island",
            (F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("id", "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select("id", "span_start", "span_end")
    )
    return islands


def exact_substring_dedup(
    df: DataFrame,
    length: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document dedup report + cleaned text.

    Returns ``(id_col, n_tokens, n_spans, n_tokens_removed,
    text_dedup)`` where ``text_dedup`` re-joins the surviving tokens
    (lowercased-alphanumeric token stream, single-space separated —
    the shared curation tokenization, NOT the raw byte text). Documents
    with no duplicated spans keep all tokens.
    """
    islands = duplicated_spans(df, length, id_col, text_col)
    per_doc = islands.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("n_tokens_removed"),
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
    )
    toks = F.filter(
        F.transform(
            _tokens(F.col(text_col)),
            lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p")),
        ),
        lambda z: ~F.exists(
            F.coalesce(F.col("spans"), F.array().cast(
                "array<struct<span_start:int,span_end:int>>")),
            lambda r: (z["p"] >= r["span_start"]) & (z["p"] <= r["span_end"]),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), text_col)
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long").alias("n_tokens_removed"),
            F.concat_ws(" ", F.transform(toks, lambda z: z["t"])).alias("text_dedup"),
        )
    )
