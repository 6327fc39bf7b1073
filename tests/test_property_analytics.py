"""Property tests: analytics operators vs brute-force Python models
on arbitrary small inputs (hypothesis)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.operators.graph import triangle_count
from pyspark_scd_spark.operators.quality import category_drift_chisq
from pyspark_scd_spark.operators.relational import basket_lift_pairs

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
            round(n / n_baskets, 6),
            round(n / item_n[p[0]], 6),
            round((n / item_n[p[0]]) * (n_baskets / item_n[p[1]]), 6),
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
        expected[g] = (ng, round(chi, 4), len(cats) - 1)
    df = spark.createDataFrame(list(rows), ["grp", "cat"])
    got = {
        r["grp"]: (r["n_rows"], r["chi_square"], r["dof"])
        for r in category_drift_chisq(df, "grp", "cat").collect()
    }
    assert got == expected
