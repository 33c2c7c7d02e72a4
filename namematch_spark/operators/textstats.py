"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All native expressions (split/regexp/aggregate) — these run as a single
narrow projection over the corpus scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from namematch_spark.operators.blocking import MERSENNE_P, portable_hash64

# Tiny deterministic stopword profiles for the n-gram/stopword language
# heuristic.  Real pipelines swap in fastText/CLD — the *operator shape*
# (per-language hit-ratio argmax as a narrow projection) is what matters.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une",
           "que"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "para", "con",
           "una"],
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.when(F.trim(F.col(text_col)) == "", F.lit(0)
                  ).otherwise(F.size(tokens(text_col)))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-style subword proxy: count of alpha runs, digit runs and
    punctuation marks (the standard ~GPT-2 pre-tokenizer regex family),
    a cheap, deterministic stand-in for a real tokenizer's token count.
    """
    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)),
        F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(arr)


def lang_hit_ratio(lang: str, text_col: str = "text") -> Column:
    """Share of tokens that are stopwords of ``lang``."""
    toks = tokens(text_col)
    words = LANG_PROFILES[lang]
    hits = F.size(F.filter(
        toks, lambda t: t.isin(words)))
    return F.round(hits.cast("double")
                   / F.greatest(F.size(toks), F.lit(1)), 6)


def lang_id(text_col: str = "text") -> Column:
    """Predicted language = argmax stopword hit ratio, 'und' when all
    zero.  Deterministic tie-break: profile order."""
    result = F.lit("und")
    best = F.lit(0.0)
    for lang in LANG_PROFILES:
        r = lang_hit_ratio(lang, text_col)
        result = F.when(r > best, F.lit(lang)).otherwise(result)
        best = F.when(r > best, r).otherwise(best)
    return result


def quality_features(text_col: str = "text") -> list[Column]:
    """Document quality heuristics (Gopher/C4-style):
    length, mean word length, stopword ratio, punctuation density,
    uppercase ratio, digit ratio."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    return [
        n_chars.alias("q_n_chars"),
        F.size(toks).alias("q_n_tokens"),
        F.round((n_chars - F.size(toks) + 1).cast("double") / n_tokens, 6)
        .alias("q_mean_word_len"),
        lang_hit_ratio("en", text_col).alias("q_stopword_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
            .cast("double") / F.greatest(n_chars, F.lit(1)), 6)
        .alias("q_punct_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(t, r"[A-Z]", "")))
            .cast("double") / F.greatest(n_chars, F.lit(1)), 6)
        .alias("q_upper_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(t, r"[0-9]", "")))
            .cast("double") / F.greatest(n_chars, F.lit(1)), 6)
        .alias("q_digit_ratio"),
    ]


def quality_score(text_col: str = "text") -> Column:
    """Scalar quality in [0,1]: sane length band, words neither too
    short nor too long, some stopwords, limited punctuation."""
    n = F.length(F.col(text_col))
    toks = tokens(text_col)
    mean_wl = (n - F.size(toks) + 1).cast("double") \
        / F.greatest(F.size(toks), F.lit(1))
    sw = lang_hit_ratio("en", text_col)
    punct = (n - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]",
                                           ""))).cast("double") \
        / F.greatest(n, F.lit(1))
    score = (
        F.when((n >= 50) & (n <= 50000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0),
                 F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sw >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return F.round(score, 2)


def doc_fingerprint(text_col: str = "text", n: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum portable hash over the
    document's character n-gram shingles (robust to local edits; equal
    fingerprints ⇒ likely shared content block)."""
    t = F.lower(F.trim(F.col(text_col)))
    k = F.greatest(F.length(t) - (n - 1), F.lit(1))
    seq = F.sequence(F.lit(1), k)
    grams = F.transform(seq, lambda i: t.substr(i, F.lit(n)))
    return F.array_min(F.transform(
        grams, lambda g: F.pmod(portable_hash64(g), F.lit(MERSENNE_P))))


def text_profile(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document profile: language, quality, token counts,
    fingerprint."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        lang_id(text_col).alias("pred_lang"),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subwords"),
        quality_score(text_col).alias("quality"),
        doc_fingerprint(text_col).alias("fingerprint"),
        *quality_features(text_col),
    )
