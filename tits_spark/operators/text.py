"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. Pure column
expressions (regex/length/hash built-ins) — oracle-checkable in SQL and
codegen-friendly at 100 TB."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text_col: Column) -> Column:
    """THE shared curation tokenizer: lowercased alphanumeric word
    tokens, empties removed. Canonical home of the scheme every
    token-level operator (decontam, vocab, substring_dedup, repetition)
    and every DuckDB oracle mirrors — change it here and nowhere else."""
    return F.filter(
        F.split(F.lower(F.regexp_replace(text_col, "[^a-zA-Z0-9]+", " ")), " "),
        lambda t: t != "",
    )


def word_ngrams_col(text_col: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams of ``text_col``.

    The tokens array is BOUND ONCE per row via a one-element outer
    ``transform`` (the lambda parameter is a materialized value, a
    plain subexpression is not): referencing ``_tokens(text)`` inside
    the per-position lambda would re-run the regex tokenization for
    EVERY gram position — O(len^2) per document, measured 8x the wall
    on the trigram corpus pass.

    Guarded so documents shorter than ``n`` words yield an empty array
    (``F.sequence(1, 0)`` would otherwise produce a *descending* range).
    """
    empty = F.array().cast("array<string>")
    return F.element_at(
        F.transform(
            F.array(_tokens(text_col)),
            lambda toks: F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                ),
            ).otherwise(empty),
        ),
        1,
    )

# tiny English stopword list for the n-gram/stopword heuristics
STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "or", "an", "be", "this", "are",
]


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is
    also exposed as ``n_subwords``)."""
    txt = F.trim(F.col(text_col))
    n_ws = F.when(txt == "", F.lit(0)).otherwise(F.size(F.split(txt, r"\s+")))
    return df.withColumn(out, n_ws).withColumn(
        "n_subwords", F.ceil(F.length(txt) / F.lit(4)).cast("int")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a [0,1]
    composite quality score."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_alpha = F.length(F.regexp_replace(F.lower(txt), "[^a-z]", ""))
    n_punct = F.length(F.regexp_replace(txt, "[^!-/:-@\\[-`{-~]", ""))
    n_digit = F.length(F.regexp_replace(txt, "[^0-9]", ""))
    toks = F.split(F.trim(txt), r"\s+")
    n_tok = F.when(F.trim(txt) == "", F.lit(0)).otherwise(F.size(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    mean_wlen = F.when(n_tok > 0, F.length(F.regexp_replace(txt, r"\s+", "")) / n_tok)

    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))

    # composite: favor alphabetic, mid-length, low punct/digit noise
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * len_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio + digit_ratio, F.lit(1.0)))
    )
    return (
        df.withColumn("n_chars_", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("quality", score)
    )


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: English stopword density over tokens ->
    'en' above 2%, else 'other'. (A real n-gram profile model slots in
    here; the plumbing — per-row token scan, no UDF — is the point.)"""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return df.withColumn(out, F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("other")))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 over
    lowercased, whitespace-collapsed text. Byte-stable across engines
    (the rolling-hash analog of the reference's xxHash32 keying,
    ref:hash.c:325-344)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Gopher-style within-document repetition features (Rae et al.
    2021, table A1): documents dominated by a repeated phrase or
    boilerplate block are low-quality training data even when their
    character-class ratios look fine.

    Per document, over lowercased-alphanumeric word tokens:

     - ``top{n}gram_char_frac`` for n in ``top_ns``: character mass of
       the single most frequent word n-gram (count x its non-space
       char length) over the doc's total token chars. The "most
       frequent" gram is chosen by (count, char mass, gram) descending
       — a total order, so the result is partition-layout invariant.
     - ``dup{n}gram_char_frac`` for n in ``dup_ns``: character mass of
       the *repeated* occurrences (count - 1 per distinct gram that
       appears more than once) over total token chars.
     - ``dup_line_frac``: fraction of non-empty trimmed lines that are
       duplicates of an earlier line — computed purely with array
       expressions (size - size(array_distinct)), no shuffle.

    Plan shape: ONE exploded frame carries every (n, gram) pair tagged
    by n, so all gram statistics share a single shuffle keyed by
    (doc, n, gram) with map-side partial aggregation; line stats are
    shuffle-free column algebra. Docs with no qualifying grams get 0.0
    via the final left join from the id spine.
    """
    txt = F.col(text_col)
    toks = _tokens(txt)
    tot_chars = F.length(F.concat_ws("", toks))

    # one array of (n, gram) structs covering every requested n.
    # NB: the tag lambda must be single-argument — a two-parameter
    # lambda is PySpark's (element, index) transform form and would
    # silently receive the array index as its second argument.
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    # dedupe the union of requested n's: an n appearing in BOTH top_ns
    # and dup_ns must explode once, not twice (double-counted grams
    # would double every cnt and corrupt both fractions)
    all_ns = sorted(set(top_ns) | set(dup_ns))
    tagged = F.flatten(
        F.array(*[F.transform(word_ngrams_col(txt, n), _tag(n)) for n in all_ns])
    )
    from tits_spark.operators.skew import ensure_min_parallelism

    exploded = ensure_min_parallelism(df).select(
        F.col(id_col),
        tot_chars.alias("_tot"),
        F.explode(tagged).alias("t"),
    ).select(id_col, "_tot", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))

    gram_counts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("_tot").alias("_tot")
    )
    mass = F.length(F.regexp_replace(F.col("gram"), " ", ""))
    per_n = gram_counts.groupBy(id_col, "n").agg(
        # argmax by (count, char mass, gram): struct max is lexicographic
        F.max(
            F.struct(F.col("cnt"), (F.col("cnt") * mass).alias("m"), F.col("gram"))
        ).alias("top"),
        F.sum(F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * mass).otherwise(0)).alias(
            "dupmass"
        ),
        F.first("_tot").alias("_tot"),
    )
    frac = lambda num: F.round(num / F.col("_tot"), 6)  # noqa: E731
    wide = per_n.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, frac(F.col("top.m")))), F.lit(0.0)
            ).alias(f"top{n}gram_char_frac")
            for n in top_ns
        ],
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, frac(F.col("dupmass")))), F.lit(0.0)
            ).alias(f"dup{n}gram_char_frac")
            for n in dup_ns
        ],
    )

    lines = F.filter(
        F.transform(F.split(txt, "\n"), lambda ln: F.trim(ln)), lambda ln: ln != ""
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines))) / n_lines, 6),
    ).otherwise(F.lit(0.0))

    frac_cols = [f"top{n}gram_char_frac" for n in top_ns] + [
        f"dup{n}gram_char_frac" for n in dup_ns
    ]
    return (
        df.select(F.col(id_col), dup_line_frac.alias("dup_line_frac"))
        .join(wide, id_col, "left")
        .select(
            id_col,
            *[F.coalesce(c, F.lit(0.0)).alias(c) for c in frac_cols],
            "dup_line_frac",
        )
    )
