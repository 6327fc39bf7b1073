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


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The retrieval suite's shared stage: corpus tokenize ->
    (doc_id, tok, tf) partial-aggregated postings. Every BM25-backed
    consumer (hybrid_search_rrf, retrieval_disagreement) needs exactly
    this table; stage it once (write_staged / cache) and pass it as
    ``term_freq`` so the corpus-wide tokenize+explode runs once per
    corpus snapshot instead of once per query suite — the same
    shared-stage convention as dedup's shingle staging."""
    toks = docs.select(
        F.col(id_col), F.explode(TXT.tokens(text_col)).alias("tok")
    )
    return toks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    term_freq: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 top-k per query: score(q, d) = Σ_t idf(t) ·
    tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avgdl)) over the query's
    distinct tokens, idf = ln((N − df + ½)/(df + ½) + 1).

    Plan shape at 100 TB: the corpus tokenizes once into (doc, term,
    tf) partial-aggregated rows; the query term set (tiny) broadcasts
    onto it, so only candidate postings — documents sharing at least
    one query term — survive to the scoring join, exactly an inverted
    index probe. Doc lengths join the candidate set on doc_id; the
    corpus-wide constants (N, avgdl) ride a broadcast 1-row cross
    join, never a single-partition window. Scores round to 6 dp with
    id tie-break so ranking is engine-reproducible.

    ``exclude_self`` drops candidates whose doc id equals the query
    id — set it ONLY when query ids and doc ids share a namespace
    (queries drawn from the corpus, as in ``hybrid_search_rrf``);
    with an external query table an id collision would silently drop
    a legitimate result, so it defaults off.
    """
    tf = (
        term_freq
        if term_freq is not None
        else term_frequencies(docs, id_col, text_col)
    )
    dlen = tf.groupBy(id_col).agg(F.sum("tf").alias("dlen"))
    stats = dlen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dlen").alias("avgdl"),
    )
    qtok = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(TXT.tokens(text_col))).alias("tok"),
    )
    # Restrict the postings to the query's terms FIRST (broadcast
    # semi-reduction), then aggregate df over the restricted set only
    # — identical df values for every term actually scored, without a
    # full-vocabulary exchange.
    tfq = tf.join(
        F.broadcast(qtok.select("tok").distinct()), "tok"
    )
    dfreq_q = tfq.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    cand = tfq.join(F.broadcast(qtok), "tok")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(query_id_col))
    cand = (
        cand.join(F.broadcast(dfreq_q), "tok")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dlen") / F.col("avgdl"))
        )
    )
    scored = (
        cand.select(query_id_col, id_col, term.alias("__t"))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__t"), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "bm25", "rank")
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    k0: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    term_freq: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the standard
    RAG-stack shape: a lexical BM25 ranking and a dense cosine ranking
    are each cut at ``k0``, then fused by rrf = Σ 1/(rrf_k + rank)
    over the lists that contain the candidate (a missing list
    contributes 0), final top-``k`` per query.

    Both legs broadcast the (tiny) query set over the corpus —
    candidate generation never shuffles the big side — and the fusion
    is a full outer join of two ≤|Q|·k0 ranked lists, driver-free.
    RRF terms are reciprocals of small integers, so the fused score is
    bit-identical across engines (no float-order risk); ties break on
    doc id.
    """
    from pyspark_scd_spark.functions import vectors as V

    ids = [int(q) for q in query_ids]
    kw = bm25_topk(
        docs,
        docs.filter(F.col(id_col).isin(ids)).select(
            F.col(id_col).alias("query_id"), text_col
        ),
        k=k0,
        id_col=id_col,
        text_col=text_col,
        exclude_self=True,  # queries ARE corpus docs here
        term_freq=term_freq,
    ).select(
        "query_id",
        F.col(id_col),
        F.col("rank").alias("kw_rank"),
    )
    qv = embeddings.filter(F.col(vec_id_col).isin(ids)).select(
        F.col(vec_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    )
    vec_scored = (
        embeddings.join(F.broadcast(qv))
        .filter(F.col(vec_id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(vec_id_col).alias(id_col),
            F.round(V.cosine(F.col(vec_col), F.col("__qv")), 6).alias(
                "cosine"
            ),
        )
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    vec = (
        vec_scored.withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= k0)
        .select("query_id", id_col, "vec_rank")
    )
    fused = kw.join(vec, ["query_id", id_col], "full_outer")
    rrf = F.coalesce(
        1.0 / (F.lit(rrf_k) + F.col("kw_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("__rrf").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("__rrf", rrf)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.col("kw_rank").cast("int").alias("kw_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            F.round(F.col("__rrf"), 6).alias("rrf_score"),
            "rank",
        )
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 10,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: top-``k`` adjacent token pairs by pointwise
    mutual information, PMI = ln(p(ab) / (p(a)·p(b))) with
    probabilities over the adjacent-pair space — high PMI means the
    pair co-occurs far more than chance ("new york", "machine
    learning"), the standard phrase-detection signal feeding
    tokenizer/phrase vocabularies. ``min_count`` drops rare pairs
    whose PMI estimates are noise (the classic PMI pathology).

    One pair explode + two map-side-combined aggregates (pairs and
    unigrams); totals ride 1-row broadcasts; the top-k is a
    TakeOrdered — no corpus-sized sort.
    """
    toks = docs.select(TXT.tokens(text_col).alias("__toks")).filter(
        F.size("__toks") > 1
    )
    # cached: pair counts and both unigram arms consume this explode —
    # uncached, the corpus-wide tokenize+zip+explode would run 3x.
    # Lifetime contract (same as dedup._shingles): held until LRU
    # eviction; repeated calls in a long session should clearCache().
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                    F.expr("slice(__toks, 2, size(__toks) - 1)"),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("tok_a"), F.col("p.1").alias("tok_b"))
        .cache()
    )
    pair_counts = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("pair_n")
    )
    # unigram frequencies over the SAME pair space (left + right
    # occurrences), so p(a)·p(b) and p(ab) share a denominator
    uni = (
        pairs.select(F.col("tok_a").alias("tok"))
        .unionAll(pairs.select(F.col("tok_b").alias("tok")))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("uni_n"))
    )
    tot_pairs = pair_counts.agg(
        F.sum("pair_n").cast("double").alias("__tp")
    )
    scored = (
        pair_counts.filter(F.col("pair_n") >= min_count)
        .join(
            uni.select(F.col("tok").alias("tok_a"), F.col("uni_n").alias("__na")),
            "tok_a",
        )
        .join(
            uni.select(F.col("tok").alias("tok_b"), F.col("uni_n").alias("__nb")),
            "tok_b",
        )
        .crossJoin(F.broadcast(tot_pairs))
        # every pair contributes one left + one right occurrence, so
        # the unigram total is EXACTLY 2x the pair total — no second
        # corpus aggregate needed
        .withColumn("__tu", 2.0 * F.col("__tp"))
        .select(
            "tok_a",
            "tok_b",
            "pair_n",
            F.round(
                F.log(
                    (F.col("pair_n") / F.col("__tp"))
                    / (
                        (F.col("__na") / F.col("__tu"))
                        * (F.col("__nb") / F.col("__tu"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
    ).limit(k)


def retrieval_disagreement(
    docs: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k0: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    term_freq: DataFrame | None = None,
) -> DataFrame:
    """Retriever-distillation hard-pair mining: the candidates the
    lexical and dense tiers DISAGREE on — docs in exactly one tier's
    top-``k0``. A BM25-only hit is a dense-retriever miss candidate
    (trains the embedding model); a cosine-only hit is a lexical
    blind spot (vocabulary mismatch). The agreement set carries no
    training signal; mining the symmetric difference is the standard
    first step of retriever distillation.

    Same two legs as ``hybrid_search_rrf`` (BM25 inverted-index
    probe, broadcast-query cosine); the mining itself is a full-outer
    join of two ≤|Q|·k0 ranked lists keeping the one-sided rows.

    Returns (query_id, doc_id, found_by ∈ {lexical, dense}, kw_rank,
    vec_rank) where exactly one rank is non-null.
    """
    from pyspark_scd_spark.functions import vectors as V

    ids = [int(q) for q in query_ids]
    kw = bm25_topk(
        docs,
        docs.filter(F.col(id_col).isin(ids)).select(
            F.col(id_col).alias("query_id"), text_col
        ),
        k=k0,
        id_col=id_col,
        text_col=text_col,
        exclude_self=True,
        term_freq=term_freq,
    ).select("query_id", F.col(id_col), F.col("rank").alias("kw_rank"))
    qv = embeddings.filter(F.col(vec_id_col).isin(ids)).select(
        F.col(vec_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    )
    vec_scored = (
        embeddings.join(F.broadcast(qv))
        .filter(F.col(vec_id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(vec_id_col).alias(id_col),
            F.round(V.cosine(F.col(vec_col), F.col("__qv")), 6).alias(
                "cosine"
            ),
        )
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    vec = (
        vec_scored.withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= k0)
        .select("query_id", id_col, "vec_rank")
    )
    both = kw.join(vec, ["query_id", id_col], "full_outer")
    return (
        both.filter(
            F.col("kw_rank").isNull() | F.col("vec_rank").isNull()
        )
        .select(
            "query_id",
            id_col,
            F.when(F.col("kw_rank").isNotNull(), F.lit("lexical"))
            .otherwise(F.lit("dense"))
            .alias("found_by"),
            F.col("kw_rank").cast("int").alias("kw_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
        )
    )
