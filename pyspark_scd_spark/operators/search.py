"""Corpus search primitives: TF-IDF term weighting and an inverted index.

Both are pure DataFrame plans over the shared tokenizer
(functions/text.py ``tokens`` — keep the regex in sync with the DuckDB
oracle twin). The reference has no text operators at all
(reference jobs/create_employee_all.py — SURVEY.md §2b "scalar
functions: exactly four"); these belong to the BASELINE.json
training-data-pipeline extension family.

Scale notes (100 TB design point):
- TF-IDF: the explode produces |tokens| rows, but the per-doc term
  count aggregates map-side (combine on (doc_id, term)) before the one
  hash exchange; document frequencies aggregate the *distinct-term*
  projection (|vocab x docs-containing| rows, far smaller than
  |tokens|) and the resulting df table is vocab-sized, so the join
  back onto per-doc counts broadcasts for any realistic vocabulary.
- Inverted index: one exchange on token. Posting lists are capped
  (``max_postings``) BEFORE materialization via slice(sort_array(...)),
  so a stop-word token costs a bounded row, not an unbounded array —
  the classic long-posting skew killer. df_docs keeps the true count
  even where the list is truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_scd_spark.functions import text as TXT


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = raw in-document term count; idf = ln(N / df) with N = total
    documents and df = documents containing the term; ties broken by
    term ASC so the top-k is deterministic. Output: (doc_id, term, tf,
    df_docs, tfidf, term_rank).
    """
    terms = docs.select(
        F.col(id_col), F.explode(TXT.tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # df over the distinct (doc, term) projection tf already is.
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("__n") / F.col("df_docs")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df_docs", "tfidf", "term_rank")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 20,
) -> DataFrame:
    """Token -> capped posting list over the corpus.

    Output: (term, df_docs, postings) where ``postings`` is the first
    ``max_postings`` doc ids (ascending) containing the term, joined
    with ',' so the driver's value-hash comparison sees a scalar, and
    ``df_docs`` is the UNCAPPED document frequency.
    """
    terms = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(TXT.tokens(text_col))).alias("term"),
    )
    return terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list(id_col)),
                    1,
                    max_postings,
                ),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
