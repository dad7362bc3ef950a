"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. Pure column
expressions (regex/length/hash built-ins) — oracle-checkable in SQL and
codegen-friendly at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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
