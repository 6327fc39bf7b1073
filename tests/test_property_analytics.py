"""Property tests: analytics operators vs brute-force Python models
on arbitrary small inputs (hypothesis)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.operators.graph import triangle_count
from pyspark_scd_spark.operators.quality import category_drift_chisq
from pyspark_scd_spark.operators.relational import basket_lift_pairs


def _round_half_up(x: float, ndigits: int) -> float:
    """Mirror Spark's F.round for non-negative doubles.

    Spark rounds BigDecimal.valueOf(double) — i.e. the shortest decimal
    repr of the double — HALF_UP (away from zero). Python's built-in
    round() is half-even (banker's) and diverges on exact .xxx5
    boundaries (round(0.15625, 4) == 0.1562, Spark/DuckDB give 0.1563),
    so brute-force expected values must use this, not round().
    """
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_triangle_count_matches_bruteforce(spark, edges):
    undirected = {frozenset(e) for e in edges if e[0] != e[1]}
    if not undirected:
        return
    adj = {tuple(sorted(e)) for e in undirected}
    nodes = sorted({n for e in adj for n in e})
    expected: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in adj and (b, c) in adj and (a, c) in adj):
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == expected


@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcd")),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_basket_lift_matches_bruteforce(spark, baskets):
    rows = sorted(set(baskets))
    by_basket: dict[int, set] = {}
    for b, i in rows:
        by_basket.setdefault(b, set()).add(i)
    n_baskets = len(by_basket)
    item_n: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for items in by_basket.values():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
        for i, j in combinations(sorted(items), 2):
            pair_n[(i, j)] = pair_n.get((i, j), 0) + 1
    expected = {
        p: (
            n,
            _round_half_up(n / n_baskets, 6),
            _round_half_up(n / item_n[p[0]], 6),
            _round_half_up((n / item_n[p[0]]) * (n_baskets / item_n[p[1]]), 6),
        )
        for p, n in pair_n.items()
        if n >= 2
    }
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_count"], r["support"], r["confidence_a_to_b"], r["lift"]
        )
        for r in basket_lift_pairs(df, "basket", "item",
                                   min_pair_count=2).collect()
    }
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("pqr")),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_chisq_matches_bruteforce(spark, rows):
    cont: dict[tuple, int] = {}
    for g, c in rows:
        cont[(g, c)] = cont.get((g, c), 0) + 1
    groups = sorted({g for g, _ in cont})
    cats = sorted({c for _, c in cont})
    margin = {c: sum(v for (g, cc), v in cont.items() if cc == c)
              for c in cats}
    total = sum(cont.values())
    expected = {}
    for g in groups:
        ng = sum(v for (gg, _), v in cont.items() if gg == g)
        chi = 0.0
        for c in cats:
            e = ng * (margin[c] / total)
            o = cont.get((g, c), 0)
            chi += (o - e) ** 2 / e
        expected[g] = (ng, _round_half_up(chi, 4), len(cats) - 1)
    df = spark.createDataFrame(list(rows), ["grp", "cat"])
    got = {
        r["grp"]: (r["n_rows"], r["chi_square"], r["dof"])
        for r in category_drift_chisq(df, "grp", "cat").collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# BPE trainer vs the pure-Python reference on random corpora
# ---------------------------------------------------------------------------


@st.composite
def _corpora(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    docs = []
    for _ in range(n_docs):
        n = draw(st.integers(min_value=0, max_value=12))
        docs.append([draw(st.sampled_from("ab c".split() + ["ab", "c", "d"]))
                     for _ in range(n)])
    return docs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpora(), n_merges=st.integers(min_value=1, max_value=3))
def test_bpe_train_matches_python_reference(spark, docs, n_merges):
    from tests.test_corpus import _bpe_reference

    from pyspark_scd_spark.operators import corpus

    rows = [(i + 1, " ".join(t)) for i, t in enumerate(docs)]
    if not any(t for t in docs):
        return
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merge_table, _ = corpus.bpe_train_merges(df, n_merges=n_merges)
    got = [
        (r["step"], r["token_a"], r["token_b"], r["pair_freq"],
         r["tokens_after"])
        for r in merge_table.orderBy("step").collect()
    ]
    # reference runs exactly as many rounds as pairs exist
    ref_docs = [t for t in docs if t]
    want = []
    state = ref_docs
    for step in range(1, n_merges + 1):
        if not any(len(t) > 1 for t in state):
            break
        m, state = _bpe_reference(state, 1)
        s, a, b, f, tot = m[0]
        want.append((step, a, b, f, tot))
    assert got == want


# ---------------------------------------------------------------------------
# Debounce vs a brute-force python model
# ---------------------------------------------------------------------------


@st.composite
def _event_streams(draw):
    n = draw(st.integers(min_value=0, max_value=15))
    out = []
    for i in range(n):
        out.append(
            (
                i + 1,
                draw(st.integers(min_value=0, max_value=60)),  # seconds
                draw(st.sampled_from([1, 2])),                 # user
                draw(st.sampled_from(["a", "b"])),             # type
            )
        )
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=_event_streams())
def test_debounce_matches_python_model(spark, evs):
    import datetime as dt

    from pyspark_scd_spark.operators import sequence as SQ

    if not evs:
        return
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (eid, t0 + dt.timedelta(seconds=s), u, ty) for eid, s, u, ty in evs
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        r["event_id"]: r["n_suppressed"]
        for r in SQ.debounce_events(df, gap="5 seconds").collect()
    }
    # model: per (user,type) in (ts, id) order, chained 5s bursts
    want = {}
    from collections import defaultdict
    streams = defaultdict(list)
    for eid, s, u, ty in evs:
        streams[(u, ty)].append((s, eid))
    for k, lst in streams.items():
        lst.sort()
        leader, cnt, last = None, 0, None
        for s, eid in lst:
            if leader is None or s - last > 5:
                if leader is not None:
                    want[leader] = cnt
                leader, cnt = eid, 0
            else:
                cnt += 1
            last = s
        want[leader] = cnt
    assert got == want


_WORDS = st.sampled_from(["a", "b", "cc", "dd", "e1", "xyz"])
_TEXTS = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


@given(
    texts=st.lists(_TEXTS, min_size=1, max_size=8),
    k=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_paragraph_dedup_matches_bruteforce(spark, texts, k):
    from pyspark_scd_spark.operators.corpus import paragraph_dedup
    import hashlib

    rows = [(i, t) for i, t in enumerate(texts)]
    # brute force: first occurrence of each k-word span wins, docs
    # reassembled from surviving spans in position order
    seen: set[str] = set()
    expected = {}
    for doc_id, text in rows:
        toks = text.split()
        if not toks:
            continue
        paras = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        expected[doc_id] = (
            len(paras),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_text_md5"])
        for r in paragraph_dedup(df, para_words=k).collect()
    }
    assert got == expected


@given(
    texts=st.lists(
        st.lists(_WORDS, min_size=0, max_size=10).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    n=st.integers(2, 3),
)
@settings(**_SETTINGS)
def test_bloom_decontaminate_matches_bruteforce(spark, texts, n):
    """Full brute-force replay of the Bloom filter INCLUDING its
    false positives: positions from the same md5-60bit formula."""
    from pyspark_scd_spark.operators.corpus import bloom_decontaminate
    from pyspark.sql import functions as F
    import hashlib

    m_bits, k_hashes = 65536, 3

    def pos(j, gram):
        h = hashlib.md5(f"{j}:{gram}".encode()).hexdigest()[:15]
        return int(h, 16) % m_bits

    def grams_of(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + n])
            for i in range(0, len(toks) - n + 1)
        } if len(toks) >= n else set()

    rows = [(i, t) for i, t in enumerate(texts)]
    bits = {
        pos(j, g)
        for i, t in rows
        if i % 2 == 0
        for g in grams_of(t)
        for j in range(k_hashes)
    }
    expected = {}
    for i, t in rows:
        if i % 2 == 0:
            continue
        gs = grams_of(t)
        if not gs:
            continue
        flagged = sum(
            all(pos(j, g) in bits for j in range(k_hashes)) for g in gs
        )
        expected[i] = (len(gs), flagged, flagged > 0)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["is_flagged"])
        for r in bloom_decontaminate(
            df, eval_pred=(F.col("doc_id") % 2 == 0), n=n
        ).collect()
    }
    assert got == expected
