"""Text-analysis column expressions (LLM-data-pipeline surface).

All pure built-in ``pyspark.sql.functions`` column expressions — they
stay inside whole-stage codegen, no Python UDFs. Each has an ANSI-SQL
twin in ``csdid_pyspark_spark.queries`` for DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the SQL oracle can
# replicate the exact same scoring.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "von", "mit", "ein"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"] + ("it", "for", "on", "with", "as", "this", "that")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("int")


def punct_count(text: Column | str) -> Column:
    """Count of a fixed punctuation class (kept regex-dialect-portable)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))).cast("int")


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Number of tokens that are stopwords (array filter, JVM-side)."""
    toks = tokens(text)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t)))).cast("int")


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0, 1]:
    1 − punct_ratio, damped when the doc is very short (<5 tokens) or
    stopword-free. Mirrors common LLM-corpus quality filters; exact
    formula chosen to be SQL-portable."""
    ntok = token_count(text)
    punct_ratio = punct_count(text) / F.greatest(F.length(F.col(text) if isinstance(text, str) else text), F.lit(1))
    stop_ratio = stopword_count(text) / F.greatest(ntok, F.lit(1))
    base = 1.0 - punct_ratio
    short_penalty = F.when(ntok < 5, F.lit(0.5)).otherwise(F.lit(1.0))
    stop_bonus = F.when(stop_ratio > 0.05, F.lit(1.0)).otherwise(F.lit(0.8))
    return base * short_penalty * stop_bonus


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    toks = tokens(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t)))).cast("int")
    return out


def lang_id(text: Column | str) -> Column:
    """argmax-by-stopword-hits language id; 'und' when all scores are 0.

    Ties break by fixed language order (en, es, fr, de, zh) — the SQL
    oracle replicates with a greatest-first CASE chain."""
    scores = lang_scores(text)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    result = F.lit("und")
    # build reversed CASE chain so earlier langs win ties
    for lang in reversed(langs):
        result = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(result)
    return result


def normalized_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of lowercased,
    whitespace-collapsed text. Used for exact/near-exact dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
