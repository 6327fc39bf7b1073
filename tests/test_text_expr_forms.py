"""The r14 single-parse SQL forms of the text helpers must be
bit-identical to the Column-operator reference paths they shadow
(functions/text.py keeps both: str input -> parsed SQL, Column input
-> the original Column form). A divergence here silently changes
every text-derived query: tokenization, quality gates, shingles,
fingerprints. Checked on the real documents table plus edge cases
(NULL, empty, punctuation-only, digits, unicode case, whitespace
runs) — the D-suffix double literals are the load-bearing detail
(bare SQL decimals parse as DECIMAL and change result types)."""

from pyspark.sql import functions as F

from pyspark_scd_spark.functions import text as TXT

EDGES = [
    (0, None),
    (1, ""),
    (2, "!!! ??? ..."),
    (3, "12345 67890 1a2b3c"),
    (4, "The QUICK brown FOX jumps over the lazy dog the end"),
    (5, "  runs\t\tof   whitespace\n\nhere  "),
    (6, "Ünïcödé ÅÄÖ mixed CASE"),
    (7, "a b"),
    (8, "one two three four five six seven eight nine ten " * 15),
]


def _frames(spark):
    edge = spark.createDataFrame(EDGES, "doc_id long, text string")
    real = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    return [edge, real]


def _assert_same(df, new_col, ref_col):
    got = df.select(
        F.col("doc_id"), new_col.alias("a"), ref_col.alias("b")
    ).collect()
    for r in got:
        assert r.a == r.b, f"doc {r.doc_id}: {r.a!r} != {r.b!r}"


def test_scalar_helpers_expr_matches_column(spark):
    cases = [
        (TXT.tokens, None),
        (TXT.token_count, None),
        (TXT.distinct_token_count, None),
        (TXT.subword_estimate, None),
        (TXT.punct_ratio, None),
        (TXT.digit_ratio, None),
        (TXT.quality_score, None),
        (TXT.normalized, None),
        (TXT.fingerprint, None),
    ]
    for df in _frames(spark):
        for fn, _ in cases:
            _assert_same(df, fn("text"), fn(F.col("text")))
        for lang in TXT.LANG_STOPWORDS:
            _assert_same(
                df,
                TXT.lang_hits("text", lang),
                TXT.lang_hits(F.col("text"), lang),
            )


def test_quality_score_expr_type_is_double(spark):
    df = _frames(spark)[0]
    schema = df.select(TXT.quality_score("text").alias("s")).schema
    assert schema["s"].dataType.typeName() == "double"


def test_word_shingles_expr_matches_column(spark):
    for df in _frames(spark):
        toks = df.select(
            "doc_id", TXT.tokens("text").alias("__toks")
        )
        for n in (2, 3, 5):
            _assert_same(
                toks,
                TXT.word_shingles("__toks", n),
                TXT.word_shingles(F.col("__toks"), n),
            )
