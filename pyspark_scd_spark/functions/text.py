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

    Arrays shorter than ``n`` yield an EMPTY array (matching the
    oracles' LATERAL range(), which emits nothing): without the
    guard, ``sequence(0, size-n)`` is DESCENDING for size < n and
    ``element_at`` hits index <= 0, killing the job on the first
    punctuation-only document.
    """
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, i + j + 1) for j in range(n)],
                ),
            )
        ),
    ).otherwise(F.slice(toks, 1, 0))


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


def winnow_fingerprint_rows(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    hash_fn: str = "xxhash64",
):
    """Winnowing document fingerprints (the MOSS scheme): hash every
    char k-gram of the normalized text, keep the minimum hash of each
    ``window`` consecutive k-grams — any shared substring of length
    ≥ k+window−1 yields a shared fingerprint while storing ~1/window
    of the hashes. Returns (id, fingerprint) rows, distinct per doc.

    ``hash_fn``: 'xxhash64' (fast path, JVM hash) or 'md5' — the
    60-bit prefix of the gram's md5 as a BIGINT, reproducible in any
    engine exposing md5+hex (DuckDB: ``('0x' || substr(md5(g),1,15))
    ::UBIGINT``), which upgrades the driver check from rows-only to a
    full hash match.

    Implementation is ROW-based (posexplode + sliding min window), not
    nested array lambdas: Catalyst's CollapseProject inlines a bound
    array column back into any lambda that references it, re-computing
    the whole k-gram hash array per window position — O(n²·k) per
    document (measured: a single 150-char doc took 4 s). Exploding
    first forces one evaluation, and the sliding min is a codegen'd
    window over (id, pos).
    """
    from pyspark.sql import Window as W

    if hash_fn == "xxhash64":
        gram_hash = f"xxhash64(substr(__norm, i, {k}))"
    elif hash_fn == "md5":
        gram_hash = (
            f"cast(conv(substr(md5(substr(__norm, i, {k})), 1, 15), "
            f"16, 10) as bigint)"
        )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    grams = df.select(
        F.col(id_col).alias("__id"), norm.alias("__norm")
    ).select(
        "__id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(__norm), {k}) "
                f"- {k} + 1), i -> {gram_hash})"
            )
        ).alias("pos", "h"),
    )
    w_slide = W.partitionBy("__id").orderBy("pos").rowsBetween(0, window - 1)
    w_all = W.partitionBy("__id")
    return (
        grams.withColumn("__wmin", F.min("h").over(w_slide))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("pos") <= F.col("__n") - window)
        .select(F.col("__id").alias(id_col), F.col("__wmin").alias("fingerprint"))
        .distinct()
    )


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint = md5 of the normalized text (exact-dup key;
    reference's row-hash idea applied to documents,
    reference jobs/create_employee_all.py:99-109)."""
    return F.md5(normalized(col))
