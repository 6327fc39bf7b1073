"""Tests for corpus-search (TF-IDF, inverted index) and
event-sequence (Markov transitions, session paths) operators."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark_scd_spark.operators import search, sequence


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry durian"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 9, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: one session (view,click,buy), then after a 2h gap a second
    # session (view,click,buy) — the trigram must NOT bridge the gap.
    rows = [
        (1, _ts(0), 1, "view"),
        (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "buy"),
        (4, _ts(2, 30), 2, "view"),
        (5, _ts(3), 2, "view"),
        (6, dt.datetime(2024, 1, 1, 12, 0), 1, "view"),
        (7, dt.datetime(2024, 1, 1, 12, 1), 1, "click"),
        (8, dt.datetime(2024, 1, 1, 12, 2), 1, "buy"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )


def test_tfidf_idf_and_rank(docs):
    out = {
        (r["doc_id"], r["term"]): r
        for r in search.tfidf_top_terms(docs, k=3).collect()
    }
    # 'apple' appears twice in doc 1 and in 1 of 3 docs.
    r = out[(1, "apple")]
    assert r["tf"] == 2 and r["df_docs"] == 1
    assert r["tfidf"] == pytest.approx(2 * math.log(3.0), abs=1e-6)
    assert r["term_rank"] == 1
    # 'banana' is in 2/3 docs -> lower idf than apple in doc 1.
    assert out[(1, "banana")]["term_rank"] == 2


def test_tfidf_k_cap(docs):
    counts = (
        search.tfidf_top_terms(docs, k=1)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in counts)


def test_inverted_index_postings_sorted_and_capped(docs):
    out = {
        r["term"]: r for r in search.inverted_index(docs).collect()
    }
    assert out["banana"]["postings"] == "1,2"
    assert out["banana"]["df_docs"] == 2
    # within-doc repeats collapse: cherry df counts docs, not tokens
    assert out["cherry"]["df_docs"] == 2
    capped = {
        r["term"]: r
        for r in search.inverted_index(docs, max_postings=1).collect()
    }
    assert capped["banana"]["postings"] == "1"
    assert capped["banana"]["df_docs"] == 2  # uncapped frequency


def test_markov_transitions_normalized(events):
    out = {
        (r["src"], r["dst"]): r
        for r in sequence.markov_transitions(events).collect()
    }
    # user1: view>click>buy, buy>view (across the gap — Markov pairs
    # are gap-blind by design), view>click>buy; user2: view>view.
    assert out[("view", "click")]["transitions"] == 2
    assert out[("view", "view")]["transitions"] == 1
    assert out[("view", "click")]["prob"] == pytest.approx(2 / 3, abs=1e-6)
    # probs sum to 1 per src
    by_src: dict[str, float] = {}
    for (src, _), r in out.items():
        by_src[src] = by_src.get(src, 0.0) + r["prob"]
    for total in by_src.values():
        assert total == pytest.approx(1.0, abs=1e-5)


def test_session_paths_respect_gaps(events):
    out = {r["path"]: r for r in sequence.session_paths(events).collect()}
    # the two clean sessions each contribute one full trigram
    assert out["view>click>buy"]["occurrences"] == 2
    assert out["view>click>buy"]["path_rank"] == 1
    # nothing bridges the 2h gap (buy>view>click would)
    assert "buy>view>click" not in out
    assert "click>buy>view" not in out


def test_sessionize_ids(events):
    sess = sequence.sessionize(events).collect()
    u1 = sorted(
        [(r["event_id"], r["session_id"]) for r in sess if r["user_id"] == 1]
    )
    assert u1 == [(1, 1), (2, 1), (3, 1), (6, 2), (7, 2), (8, 2)]


def test_ab_test_conversion(spark):
    from pyspark_scd_spark.operators.sequence import ab_test_conversion
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for uid in range(40):
        rows.append((uid * 10, t0, uid, "view"))
        # even uids convert (2 purchases), odd don't
        if uid % 2 == 0:
            rows.append((uid * 10 + 1, t0, uid, "purchase"))
            rows.append((uid * 10 + 2, t0, uid, "purchase"))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    out = {r["variant"]: r for r in
           ab_test_conversion(ev, min_events=2).collect()}
    assert set(out) == {"A", "B"}
    total_users = out["A"]["n_users"] + out["B"]["n_users"]
    total_conv = out["A"]["n_converted"] + out["B"]["n_converted"]
    assert total_users == 40 and total_conv == 20
    # z on the A row only; finite because the pooled rate is interior
    assert out["A"]["z_score"] is not None
    assert out["B"]["z_score"] is None


def test_bm25_rare_term_outranks_common(spark):
    # doc 1 shares the RARE term 'zebra' with the query; docs 2-5
    # share only the ubiquitous term 'common'. idf must put doc 1 on
    # top despite equal term counts.
    rows = [
        (0, "zebra common alpha"),          # query doc
        (1, "zebra beta gamma"),
        (2, "common beta delta"),
        (3, "common gamma epsilon"),
        (4, "common delta zeta"),
        (5, "common epsilon eta"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    queries = docs.filter("doc_id = 0").selectExpr(
        "doc_id AS query_id", "text"
    )
    got = (
        search.bm25_topk(docs, queries, k=3, exclude_self=True)
        .orderBy("rank")
        .collect()
    )
    assert got[0]["doc_id"] == 1
    assert all(r["query_id"] == 0 for r in got)
    assert got[0]["bm25"] > got[1]["bm25"]


def test_hybrid_rrf_fuses_both_legs(spark):
    import pyspark.sql.functions as F

    rows = [
        (0, "zebra unique query words"),
        (1, "zebra matching lexical doc"),   # lexical hit, orthogonal vector
        (2, "totally different words here"),  # vector hit only
        (3, "other unrelated content body"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),   # near the query vector
            (3, [0.0, 0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    got = {
        r["doc_id"]: r
        for r in search.hybrid_search_rrf(
            docs, vecs, query_ids=[0], k=4, k0=2, rrf_k=60
        ).collect()
    }
    # doc 1: lexical rank 1, missing from vector top-2 -> kw leg only
    assert got[1]["kw_rank"] == 1
    # doc 2: vector rank 1
    assert got[2]["vec_rank"] == 1
    # rrf arithmetic: a doc present in both legs beats same-rank
    # single-leg docs; exact reciprocal sums
    for r in got.values():
        expect = (1.0 / (60 + r["kw_rank"]) if r["kw_rank"] else 0.0) + (
            1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9


def test_debounce_chained_bursts(spark):
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + _dt.timedelta(seconds=sec)
    rows = [
        # burst: 0s, 4s, 8s (chained: each gap <= 5s) -> keep id 1, n=2
        (1, s(0), 7, "click"),
        (2, s(4), 7, "click"),
        (3, s(8), 7, "click"),
        # 15s: gap 7s from id 3 -> new burst
        (4, s(15), 7, "click"),
        # different type: independent
        (5, s(1), 7, "view"),
        # different user
        (6, s(2), 8, "click"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        r["event_id"]: r
        for r in sequence.debounce_events(df, gap="5 seconds").collect()
    }
    assert set(got) == {1, 4, 5, 6}
    assert got[1]["n_suppressed"] == 2  # ids 2 and 3 swallowed
    assert got[4]["n_suppressed"] == 0
