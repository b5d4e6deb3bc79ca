"""Text analysis for training-data curation — pure Column expressions.

Everything here compiles to JVM-side Catalyst expressions (regexp_replace,
length, split, ...), so it runs inside whole-stage codegen with zero
Python in the hot path — by design these are the per-document map
functions that run over 10^12 rows before any shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# tiny per-language stopword anchors for the heuristic language id
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " nicht "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " que ", " los "],
}

_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def subword_count(col: Column) -> Column:
    """BPE-ish token estimate: word-boundary pieces + digit runs + symbol
    runs (a cheap, deterministic stand-in for a real tokenizer)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.split(col, r"(?<=[a-z])(?=[A-Z])|[^A-Za-z0-9]+"),
                lambda t: F.length(t) > 0,
            )
        )
    )


def alpha_ratio(col: Column) -> Column:
    """Fraction of [A-Za-z] characters (0.0 for empty)."""
    n = F.length(col)
    alpha = n - F.length(F.regexp_replace(col, "[A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(alpha.cast("double") / n)


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    digits = n - F.length(F.regexp_replace(col, "[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits.cast("double") / n)


def punct_ratio(col: Column) -> Column:
    """Fraction of ASCII punctuation characters."""
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, r"[!-/:-@\[-`{-~]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are english stopwords —
    a standard quality-scoring feature (exact token-set membership,
    computed JVM-side via filter on the split array)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n = token_count(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: favors alphabetic text of
    reasonable length with few digits/punct. Deterministic arithmetic
    over the ratio features (weights fixed, documented here)."""
    length_norm = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.4) * alpha_ratio(col)
        + F.lit(0.2) * length_norm
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio(col))
    )


def lang_guess(col: Column) -> Column:
    """Rule-based language id over stopword markers; 'unk' when nothing
    fires. Deliberately simple and ANSI-SQL-reproducible (the DuckDB
    oracle re-states the same CASE) — a real n-gram model would be a
    pandas UDF, same plumbing."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))

    def hits(lang: str) -> Column:
        out = F.lit(0)
        for m in _LANG_MARKERS[lang]:
            out = out + F.when(padded.contains(m), 1).otherwise(0)
        return out

    en, de, fr, es = hits("en"), hits("de"), hits("fr"), hits("es")
    best = F.greatest(en, de, fr, es)
    return (
        F.when(best == 0, "unk")
        .when(en == best, "en")   # deterministic tie-break order: en,de,fr,es
        .when(de == best, "de")
        .when(fr == best, "fr")
        .otherwise("es")
    )
