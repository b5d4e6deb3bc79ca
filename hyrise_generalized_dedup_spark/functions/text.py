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


def nonblank_lines(col: Column) -> Column:
    """Whitespace-trimmed non-blank lines of the document, as an array
    column. Regexp trim, not F.trim: SQL trim strips only 0x20 spaces,
    so a tab-only line would count as content."""
    return F.filter(
        F.transform(
            F.split(col, "\n"),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: F.length(x) > 0,
    )


def dup_line_ratio(col: Column) -> Column:
    """Fraction of non-blank lines that are repeats of another line in
    the same document (1 - distinct/total; 0.0 for line-less docs) — the
    classic within-document repetition signal for corpus quality
    filtering. Pure array HOFs: per-doc map work, no shuffle, so at
    10^12 rows this runs inside the scan stage."""
    nb = nonblank_lines(col)
    n = F.size(nb)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(nb)).cast("double") / n
    )


def dup_line_char_ratio(col: Column) -> Column:
    """Fraction of non-blank-line CHARACTERS that sit in duplicated
    lines (char-weighted repetition: one long pasted block counts for
    its size, not 1 line). O(distinct x lines) comparisons per doc via
    HOFs — still map-only."""
    nb = nonblank_lines(col)
    dl = F.array_distinct(nb)

    def _chars(dup_only: bool) -> Column:
        def per_line(d: Column) -> Column:
            cnt = F.size(F.filter(nb, lambda x: x == d))
            chars = cnt * F.length(d)
            if dup_only:
                return F.when(cnt > 1, chars).otherwise(F.lit(0))
            return chars

        return F.aggregate(
            F.transform(dl, per_line), F.lit(0), lambda acc, x: acc + x
        )

    total = _chars(False)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        _chars(True).cast("double") / total
    )


def top_line_count(col: Column) -> Column:
    """Occurrence count of the most-repeated non-blank line (0 for
    line-less docs)."""
    nb = nonblank_lines(col)
    counts = F.transform(
        F.array_distinct(nb), lambda d: F.size(F.filter(nb, lambda x: x == d))
    )
    return F.coalesce(F.array_max(counts), F.lit(0))


def dup_bigram_ratio(col: Column) -> Column:
    """Fraction of adjacent word-pair bigrams that are duplicates within
    the document (Gopher-style duplicate-n-gram filter at n=2). Guarded
    sequence: Spark's sequence(1, n) DESCENDS when n < 1, so docs with
    fewer than two tokens short-circuit to 0.0."""
    trimmed = F.trim(col)
    w = F.split(trimmed, r"\s+")
    n_tok = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(w))
    grams = F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    return F.when(n_tok < 2, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    )


def _tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed document (empty array for blank
    docs) — the shared token definition for the Gopher-style signals."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def mean_word_length(col: Column) -> Column:
    """Average token length in characters (0.0 for blank docs) — one of
    the Gopher corpus-quality rules (docs outside [3, 10] are filtered).
    Sum and count are exact integers; the single double division is
    correctly rounded identically on any IEEE engine."""
    toks = _tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n)


def alpha_word_ratio(col: Column) -> Column:
    """Fraction of tokens containing at least one [A-Za-z] character
    (Gopher: require >= 0.8) — separates prose from symbol/number soup."""
    toks = _tokens(col)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def symbol_word_ratio(col: Column) -> Column:
    """(# of '#' chars + # of '...' occurrences) / tokens (Gopher:
    filter > 0.1) — hashtag/ellipsis-heavy docs are low-quality web
    text. Occurrence counts via length deltas, so the expression stays
    JVM-side."""
    toks = _tokens(col)
    n = F.size(toks)
    n_hash = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    n_ellipsis = (
        F.length(col) - F.length(F.regexp_replace(col, r"\.\.\.", ""))
    ) / F.lit(3)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n_hash + n_ellipsis).cast("double") / n
    )


def bullet_line_ratio(col: Column) -> Column:
    """Fraction of non-blank lines that start with a bullet marker
    ('- ', '* ', or '•') — Gopher filters docs with > 0.9."""
    nb = nonblank_lines(col)
    n = F.size(nb)
    hits = F.size(
        F.filter(nb, lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("•"))
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def ellipsis_line_ratio(col: Column) -> Column:
    """Fraction of non-blank lines ending with '...' — Gopher filters
    docs with > 0.3."""
    nb = nonblank_lines(col)
    n = F.size(nb)
    hits = F.size(F.filter(nb, lambda x: x.endswith("...")))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def tokens_lower(col: Column) -> Column:
    """Guarded whitespace tokens of ``trim(lower(col))`` (empty array for
    blank docs) — the shared token base for the word-n-gram family.

    Materialize this as its OWN projected column before applying
    ``ngrams_of_tokens``: inside a higher-order-function lambda Spark
    re-evaluates inlined subexpressions per array element, so an n-gram
    expression built directly over text re-splits the whole document for
    EVERY gram (O(words^2) per doc — measured as the dominant cost of the
    decontamination/overlap queries). A separate projection pins the split
    to one evaluation per row; CollapseProject keeps it separate because
    the gram expression references the array more than once."""
    trimmed = F.trim(F.lower(col))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def ngrams_of_tokens(words: Column, n: int, distinct: bool = True) -> Column:
    """Space-joined word ``n``-grams over an already-materialized token
    array column (see ``tokens_lower``). ``distinct=True`` matches
    ``word_ngrams`` (set semantics), ``distinct=False`` matches
    ``word_ngrams_all`` (positional). Guarded-sequence caveat: sequence
    DESCENDS when the upper bound < 1, so short docs short-circuit to the
    empty array via the outer ``when``."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n) + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    out = F.array_distinct(grams) if distinct else grams
    return F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(out)


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct space-joined lowercase word ``n``-grams of the document
    (empty array when it has fewer than ``n`` tokens) — the unit of
    benchmark-decontamination matching (an eval doc and a train doc
    "overlap" when they share any such gram).

    NOTE (perf): composed inline like this the token split is re-evaluated
    per gram inside the transform lambda; hot paths should project
    ``tokens_lower`` first and call ``ngrams_of_tokens`` on the column
    (bit-identical output, linear instead of quadratic per-doc work)."""
    return ngrams_of_tokens(tokens_lower(col), n, distinct=True)


def word_ngrams_all(col: Column, n: int) -> Column:
    """Positional (non-distinct, document-ordered) space-joined lowercase
    word ``n``-grams — the unit of SPAN-level contamination measurement,
    where consecutive gram indices must stay adjacent (word_ngrams'
    array_distinct would destroy positions). Same perf note as
    ``word_ngrams``: hot paths should use ``tokens_lower`` +
    ``ngrams_of_tokens(..., distinct=False)``."""
    return ngrams_of_tokens(tokens_lower(col), n, distinct=False)


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


# C4 (Raffel et al. 2020 §2.2) blocklist stand-in: the real pipeline uses
# the LDNOOBW list; this default carries a few printable spam/adult markers
# so the rule is exercised end-to-end — swap in the full list in production.
C4_BLOCKLIST = ["viagra", "casino", "porn", "xxx"]


def c4_line_keep(line: Column) -> Column:
    """C4 line rule: ends in a terminal punctuation mark (. ! ? or a
    closing double quote) and contains at least 5 words."""
    return line.rlike('[.!?"]$') & (F.size(F.split(line, r"\s+")) >= 5)


def c4_signals(col: Column) -> dict[str, Column]:
    """The C4 document filter battery as named Column expressions:
    line retention census, sentence count over the KEPT lines (terminal
    punctuation marks), and the document-level drop rules (lorem ipsum,
    curly brace, word-boundary blocklist hit). All integer/boolean —
    bit-stable across engines."""
    nb = nonblank_lines(col)
    kept = F.filter(nb, c4_line_keep)
    kept_text = F.concat_ws("\n", kept)
    n_sentences = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, r"[.!?]", "")
    )
    lowered = F.lower(col)
    bad_re = r"\b(" + "|".join(C4_BLOCKLIST) + r")\b"
    has_badword = lowered.rlike(bad_re)
    has_lorem = lowered.contains("lorem ipsum")
    has_brace = col.contains("{")
    return {
        "n_lines": F.size(nb).cast("long"),
        "n_c4_lines": F.size(kept).cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "has_badword": has_badword,
        "c4_keep": (
            (n_sentences >= 3) & ~has_lorem & ~has_brace & ~has_badword
        ),
    }


def encoding_signals(col: Column) -> dict[str, Column]:
    """UTF-8 cleanliness / mojibake signals (the CCNet-style encoding-
    noise filter): counts of non-ASCII chars, U+FFFD replacement chars,
    C0/DEL/C1 control chars (tab/newline/CR excluded; C1 included since
    latin-1 mojibake materializes UTF-8 continuation bytes there), and
    the two classic
    Latin-1-misdecode markers — a stray 'Ã' lead byte and the 'â€'
    punctuation lead pair, which legitimate text essentially never
    contains. All counts are integers (bit-stable across engines); the
    marker counts use literal replace() length-diffs so no regex
    dialect is involved. `enc_clean` is the document-level keep rule.
    """
    n_chars = F.length(col)

    def n_matching(pattern: str) -> Column:
        return (n_chars - F.length(F.regexp_replace(col, pattern, ""))).cast(
            "long"
        )

    def n_substr(marker: str) -> Column:
        diff = n_chars - F.length(F.replace(col, F.lit(marker), F.lit("")))
        return (diff / len(marker)).cast("long")

    n_replacement = n_substr("�")
    n_control = n_matching(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    n_moji_lead = n_substr("Ã")  # 'Ã'
    n_moji_punct = n_substr("â€")  # 'â€'
    return {
        "n_chars": n_chars.cast("long"),
        "n_nonascii": n_matching(r"[^\x00-\x7F]"),
        "n_replacement": n_replacement,
        "n_control": n_control,
        "n_moji_lead": n_moji_lead,
        "n_moji_punct": n_moji_punct,
        "enc_clean": (
            (n_replacement == 0)
            & (n_control == 0)
            & (n_moji_lead == 0)
            & (n_moji_punct == 0)
        ),
    }
