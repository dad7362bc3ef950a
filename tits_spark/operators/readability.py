"""Readability scores per document — Flesch Reading Ease and
Flesch-Kincaid grade (Flesch 1948 / Kincaid et al. 1975, public
formulae), the sentence/syllable layer missing from
text.quality_features (which sees characters and tokens but neither
sentence length nor word complexity).

Deterministic counting rules, pinned so both engines agree exactly:

 - sentences: runs of terminal punctuation ``[.!?]+`` — a trailing
   unterminated fragment does NOT count, but every doc is floored at
   one sentence (a headline is one sentence, not zero);
 - words: the canonical curation tokenizer's alphanumeric tokens
   (text._tokens — the same scheme every token operator shares);
 - syllables: runs of vowels ``[aeiouy]+`` in the lowercased text —
   the standard cheap proxy (hyphenation dictionaries are
   container-unavailable and language-bound); a word with no vowel
   run ("7", "xkcd") contributes zero, matching the proxy's
   published usage.

All three counts are EXACT integers from one regexp pass each; the
two scores are fixed double trees over those integers (round 4 —
scores live in [0, ~120] and grades in [-4, ~30], so a 1e-4 quantum
is ~1e-6 relative):

    ease  = 206.835 - 1.015 * (words/sentences) - 84.6 * (syll/words)
    grade = 0.39 * (words/sentences) + 11.8 * (syll/words) - 15.59

Plan shape: pure column expressions — one scan, zero shuffles, zero
joins, zero UDFs; whole-stage codegen end to end (the cheapest kind
of operator in the repo, same class as text.quality_features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv
from tits_spark.operators.text import _tokens


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Flesch Reading Ease + Flesch-Kincaid grade.

    Returns (doc_id, n_sentences, n_words, n_syllables, flesch_ease,
    fk_grade); scores are NULL for word-free documents."""
    txt = F.col(text_col)
    n_sent = F.greatest(
        F.regexp_count(txt, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_words = F.size(_tokens(txt)).cast("long")
    n_syll = F.regexp_count(F.lower(txt), F.lit(r"[aeiouy]+")).cast("long")
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    has_words = n_words > 0
    return df.select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        F.when(has_words, F.round(ease, 4) + F.lit(0.0)).alias("flesch_ease"),
        F.when(has_words, F.round(grade, 4) + F.lit(0.0)).alias("fk_grade"),
    )


def ari_coleman_liau(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Automated Readability Index (Senter & Smith 1967) and
    Coleman-Liau index (Coleman & Liau 1975) per document — the
    character-based readability pair, complementing the syllable-based
    Flesch family above: both grade from letter density, the proxy of
    choice when syllabification is unreliable (it is — see the vowel
    run caveat in the module docstring).

    Counting rules share this module's conventions: sentences are
    terminal-punctuation runs floored at one, words are the shared
    curation tokenizer's tokens, and "letters" are the alphanumeric
    characters (the same class the tokenizer keeps), all EXACT
    integers from one regexp pass each.

        ari = 4.71 * (chars/words) + 0.5 * (words/sentences) - 21.43
        cl  = 0.0588 * (100*chars/words)
              - 0.296 * (100*sentences/words) - 15.8

    Exactness device — the cleared-denominator floor lattice, NOT a
    rounded double tree: both grades are rationals whose 2dp
    constants over small word/sentence counts routinely terminate ON
    a decimal rounding boundary (259 chars / 56 words -> ari exactly
    28.35375; any power-of-two word count manufactures more), where
    Spark's BigDecimal HALF_UP and DuckDB's double round()
    legitimately disagree at ANY rounding width. So the grades are
    emitted in exact centigrade integer units:

        ari_c = floor( (471*c*s + 50*w^2 - 2143*w*s) / (w*s) )
        cl_c  = floor( (588*c - 2960*s - 1580*w) / w )

    (multiply the published trees by 100 and clear denominators; the
    floor is the house signed floor division — exact on both engines
    for the possibly-negative numerators because the denominators are
    positive). The companion doubles ari/cl_index are ONE division of
    that integer by 100.0 — the same double on both engines by IEEE
    determinism, no round() anywhere. int64 bound: |numerators| <
    2^63 needs chars*sentences < 1.9e14, satisfied by any physically
    real document (a 10 GB single doc with one sentence per 50 chars
    is ~4e15 of headroom short of the bound; guard with the upstream
    curation length gates).

    Plan shape: pure column expressions — one scan, zero shuffles,
    zero joins, zero UDFs (identical class to readability()).

    Returns (doc_id, n_chars_an, n_words, n_sentences, ari_c, cl_c,
    ari, cl_index).
    """
    txt = F.col(text_col)
    n_sent = F.greatest(
        F.regexp_count(txt, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_words = F.size(_tokens(txt)).cast("long")
    n_chars = F.length(F.regexp_replace(txt, r"[^a-zA-Z0-9]", "")).cast(
        "long"
    )
    c, w, s = n_chars, n_words, n_sent
    ari_c = floordiv(
        F.lit(471) * c * s + F.lit(50) * w * w - F.lit(2143) * w * s, w * s
    )
    cl_c = floordiv(F.lit(588) * c - F.lit(2960) * s - F.lit(1580) * w, w)
    has_words = n_words > 0
    return df.filter(has_words).select(
        F.col(id_col),
        n_chars.alias("n_chars_an"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        ari_c.alias("ari_c"),
        cl_c.alias("cl_c"),
        (ari_c.cast("double") / F.lit(100.0)).alias("ari"),
        (cl_c.cast("double") / F.lit(100.0)).alias("cl_index"),
    )
