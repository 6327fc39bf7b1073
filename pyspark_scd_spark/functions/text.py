"""Text-analysis column expressions for document pipelines.

All pure Catalyst expressions (no Python UDFs) — they run inside
whole-stage codegen and scale linearly with the scan. Each has an exact
DuckDB-SQL twin used by the oracle harness; keep the two in sync
(tokenization regex, null handling, rounding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on runs of non-alphanumerics, drop
# empty tokens. DuckDB twin:
#   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a token array.

    ``transform(sequence(0, size-n), i -> concat_ws(' ', slice(...)))``
    — array ops in codegen, no explode until the caller needs rows.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )


def subword_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate: whitespace tokens re-split into
    ≤4-char pieces — sum(ceil(len(tok)/4)). A cheap, deterministic
    proxy for LLM tokenizer counts (real BPE needs a vocab file)."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


# Stopword lists for the language-ID heuristic: tiny, high-frequency
# function words per language. Deliberately minimal — the point is the
# *operator shape* (vocabulary-overlap scoring, pure column math), not
# linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "y", "un", "una", "es"],
}


def lang_hits(col: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(stop, t))
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(
        F.regexp_replace(c, r"[^\w\s]", "")
    )
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(
        F.lit(0.0)
    )


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(F.length(c) > 0, n_digit / F.length(c)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough text (40%), lexical
    diversity (40%), low digit noise (20%). Deterministic column math;
    mirror any change in the oracle SQL."""
    n_tok = token_count(col).cast("double")
    diversity = F.when(
        n_tok > 0, distinct_token_count(col) / n_tok
    ).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    return (
        length_score * 0.4 + diversity * 0.4 + (1.0 - digit_ratio(col)) * 0.2
    )


def normalized(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint = md5 of the normalized text (exact-dup key;
    reference's row-hash idea applied to documents,
    reference jobs/create_employee_all.py:99-109)."""
    return F.md5(normalized(col))
