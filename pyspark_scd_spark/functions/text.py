"""Text-analysis column expressions for document pipelines.

All pure Catalyst expressions (no Python UDFs) — they run inside
whole-stage codegen and scale linearly with the scan. Each has an exact
DuckDB-SQL twin used by the oracle harness; keep the two in sync
(tokenization regex, null handling, rounding).

r14: every helper that receives a COLUMN NAME builds its expression as
one parsed SQL string (a single py4j round trip) instead of a chain of
Column operators (~5-20 round trips each; these helpers are called
from ~70 sites, and the bench times query construction, so the chatter
was measurable driver wall — profile: corpus_release alone spent
~0.7 s in them). The Column-object path is KEPT for Column inputs and
is the pinned reference semantics: tests/test_text_expr_forms.py
asserts the two paths produce bit-identical values on real and edge
data. Numeric literals in SQL text carry an explicit D suffix — a bare
``0.4`` parses as DECIMAL(1,1), not the DOUBLE that F.lit(0.4) builds,
which would change result types.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on runs of non-alphanumerics, drop
# empty tokens. DuckDB twin:
#   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _q(name: str) -> str:
    """Backtick-quote a column name for SQL text."""
    return "`" + name.replace("`", "``") + "`"


def _tokens_sql(q: str) -> str:
    return f"filter(split(lower({q}), '{TOKEN_SPLIT_RE}'), t -> t != '')"


def tokens(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(_tokens_sql(_q(col)))
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def token_count(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(f"size({_tokens_sql(_q(col))})")
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(f"size(array_distinct({_tokens_sql(_q(col))}))")
    return F.size(F.array_distinct(tokens(col)))


def _word_shingles_sql(q: str, n: int) -> str:
    parts = ", ".join(f"element_at({q}, i + {j + 1})" for j in range(n))
    return (
        f"CASE WHEN size({q}) >= {n} THEN array_distinct("
        f"transform(sequence(0, size({q}) - {n}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE slice({q}, 1, 0) END"
    )


def word_shingles(toks: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles from a token array.

    ``transform(sequence(0, size-n), i -> concat_ws(' ', slice(...)))``
    — array ops in codegen, no explode until the caller needs rows.

    Arrays shorter than ``n`` yield an EMPTY array (matching the
    oracles' LATERAL range(), which emits nothing): without the
    guard, ``sequence(0, size-n)`` is DESCENDING for size < n and
    ``element_at`` hits index <= 0, killing the job on the first
    punctuation-only document.
    """
    if isinstance(toks, str):
        return F.expr(_word_shingles_sql(_q(toks), n))
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
    if isinstance(col, str):
        return F.expr(
            f"aggregate({_tokens_sql(_q(col))}, CAST(0 AS BIGINT), "
            f"(acc, t) -> acc + CAST(ceil(length(t) / 4.0D) AS BIGINT))"
        )
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
    if isinstance(col, str):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        return F.expr(
            f"size(filter({_tokens_sql(_q(col))}, "
            f"t -> array_contains(array({words}), t)))"
        )
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(stop, t))
    )


def punct_ratio(col: Column | str) -> Column:
    if isinstance(col, str):
        q = _q(col)
        return F.expr(
            f"CASE WHEN length({q}) > 0 THEN "
            f"(length({q}) - length(regexp_replace({q}, '[^\\\\w\\\\s]', "
            f"''))) / length({q}) ELSE 0.0D END"
        )
    n_punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[^\w\s]", "")
    )
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(
        F.lit(0.0)
    )


def _digit_ratio_sql(q: str) -> str:
    return (
        f"CASE WHEN length({q}) > 0 THEN "
        f"(length({q}) - length(regexp_replace({q}, '[0-9]', ''))) "
        f"/ length({q}) ELSE 0.0D END"
    )


def digit_ratio(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(_digit_ratio_sql(_q(col)))
    n_digit = F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", ""))
    return F.when(F.length(col) > 0, n_digit / F.length(col)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough text (40%), lexical
    diversity (40%), low digit noise (20%). Deterministic column math;
    mirror any change in the oracle SQL."""
    if isinstance(col, str):
        q = _q(col)
        nt = f"CAST(size({_tokens_sql(q)}) AS DOUBLE)"
        dt = f"size(array_distinct({_tokens_sql(q)}))"
        return F.expr(
            f"least(1.0D, {nt} / 100.0D) * 0.4D + "
            f"(CASE WHEN {nt} > 0 THEN {dt} / {nt} ELSE 0.0D END) * 0.4D"
            f" + (1.0D - ({_digit_ratio_sql(q)})) * 0.2D"
        )
    n_tok = token_count(col).cast("double")
    diversity = F.when(
        n_tok > 0, distinct_token_count(col) / n_tok
    ).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    return (
        length_score * 0.4 + diversity * 0.4 + (1.0 - digit_ratio(col)) * 0.2
    )


def _normalized_sql(q: str) -> str:
    return f"trim(regexp_replace(lower({q}), '\\\\s+', ' '))"


def normalized(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    whitespace runs, trim."""
    if isinstance(col, str):
        return F.expr(_normalized_sql(_q(col)))
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


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
    if isinstance(col, str):
        return F.expr(f"md5({_normalized_sql(_q(col))})")
    return F.md5(normalized(col))
