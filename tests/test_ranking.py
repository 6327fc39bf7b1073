"""Scale-safe global ranking: equivalence with the (single-partition)
window form, determinism, both rank modes, and the no-SinglePartition
plan pin."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_scd_spark.operators import ranking
from pyspark_scd_spark.plans import explain
from pyspark_scd_spark.registry import REGISTRY


def test_dense_rank_matches_window_form(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(5000)
    )
    got = ranking.global_dense_rank(
        li, ["l_extendedprice"], rank_col="r"
    )
    want = li.withColumn(
        "r",
        F.dense_rank()
        .over(Window.orderBy("l_extendedprice"))
        .cast("long"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dense_rank_multi_column_and_ties(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a"), (0, "z")]
    df = spark.createDataFrame(rows, ["k", "s"])
    out = {
        (r["k"], r["s"], r["r"])
        for r in ranking.global_dense_rank(
            df, ["k", "s"], rank_col="r", num_partitions=3
        ).collect()
    }
    assert out == {
        (0, "z", 1),
        (1, "a", 2),
        (1, "b", 3),
        (2, "a", 4),
    }


def test_row_number_mode_total_key(spark):
    df = spark.createDataFrame(
        [(i,) for i in [7, 3, 9, 1, 5, 8, 2, 6, 4, 10]], ["v"]
    )
    got = sorted(
        (r["v"], r["n"])
        for r in ranking.global_dense_rank(
            df, ["v"], rank_col="n", dense=False, num_partitions=4
        ).collect()
    )
    assert got == [(v, v) for v in range(1, 11)]


def test_global_rank_plan_never_single_partitions(spark, sf_dir):
    """The returned plan is the ranking pass over the PINNED
    (checkpointed) range partitions: no exchange of any kind — and in
    particular never a SinglePartition funnel. The range exchange
    itself lives inside the checkpoint (pinned so the stats and
    ranking passes see identical partitions); assert it on the
    pre-checkpoint lineage."""
    from pyspark.sql import functions as F

    df = REGISTRY["global_dense_rank"].builder(spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "Exchange" not in plan, plan
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_extendedprice")
        .repartitionByRange("l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
    )
    assert "rangepartitioning" in explain.physical_plan(
        li.withColumn("p", F.spark_partition_id())
    )


def test_suffix_ranks_banana_and_cross_doc_ties(spark):
    """Prefix-doubling suffix ranks equal a pure-Python suffix sort —
    including REAL ties where two documents share a verbatim suffix
    (dense ranks collapse them), and the 1-char / empty-doc edges."""
    from pyspark_scd_spark.operators import dedup

    docs = {1: "banana", 2: "ana", 3: "b", 4: "", 5: "bandana"}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        (r["doc_id"], r["pos_in_doc"]): r["suffix_rank"]
        for r in dedup.suffix_ranks_prefix_doubling(df).collect()
    }
    suffixes = sorted(
        {s for d, t in docs.items() for i in range(len(t))
         for s in [t[i:]]}
    )
    rank_of = {s: i + 1 for i, s in enumerate(suffixes)}
    want = {
        (d, i): rank_of[t[i:]]
        for d, t in docs.items()
        for i in range(len(t))
    }
    assert got == want
    # the shared suffixes 'ana'/'na'/'a' tie across docs 1 and 2
    assert got[(1, 3)] == got[(2, 0)]  # 'ana'
    assert got[(1, 5)] == got[(2, 2)]  # 'a'


def test_suffix_ranks_one_char_corpus(spark):
    """mx == 1 short-circuit: ranks must still be dense 1..D, not raw
    ascii codes."""
    from pyspark_scd_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["pos_in_doc"]): r["suffix_rank"]
        for r in dedup.suffix_ranks_prefix_doubling(df).collect()
    }
    assert got == {(2, 0): 1, (1, 0): 2, (3, 0): 2}


def test_exact_substrings_cut_matches_brute_force(spark):
    """ExactSubstr materialization: the rank-pair window locator +
    numpy cut equals a brute-force L-gram Counter — including
    overlapping self-repeats ('aaaaaaaaaa'), empty docs, docs shorter
    than L, and cross-doc duplicates."""
    import hashlib
    from collections import Counter

    from pyspark_scd_spark.operators import dedup

    docs = [
        (1, "xxABCDEFGHyy"),
        (2, "zzzABCDEFGHqq"),
        (3, "completely unique text"),
        (4, "aaaaaaaaaa"),
        (5, ""),
        (6, "short"),
        (7, "tail overlap ABCDEFGH"),  # dup gram at the very end
    ]
    L = 8
    got = {
        r["doc_id"]: (
            r["n_dup_windows"], r["cut_bytes"], r["kept_len"],
            r["kept_md5"],
        )
        for r in dedup.dedup_exact_substrings(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_len=L
        ).collect()
    }
    grams = Counter(
        t[i : i + L] for _, t in docs for i in range(len(t) - L + 1)
    )
    for d, t in docs:
        starts = [
            i for i in range(len(t) - L + 1)
            if grams[t[i : i + L]] >= 2
        ]
        mask = [False] * len(t)
        for s in starts:
            for j in range(s, s + L):
                mask[j] = True
        kept = "".join(c for c, m in zip(t, mask) if not m)
        assert got[d] == (
            len(starts),
            len(t) - len(kept),
            len(kept),
            hashlib.md5(kept.encode()).hexdigest(),
        ), f"doc {d}"


def test_exact_substrings_trivial_corpus(spark):
    """Every doc shorter than L: the whole corpus is kept verbatim
    through the pre-index bail-out path."""
    import hashlib

    from pyspark_scd_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["cut_bytes"], r["kept_md5"])
        for r in dedup.dedup_exact_substrings(df, min_len=8).collect()
    }
    assert got == {
        1: (0, 0, hashlib.md5(b"abc").hexdigest()),
        2: (0, 0, hashlib.md5(b"abc").hexdigest()),
        3: (0, 0, hashlib.md5(b"").hexdigest()),
    }


def test_dense_rank_null_order_keys(spark):
    """NULLs in order_cols (the r7 ADVICE latent bug): the distinct
    count must include null-bearing tuples (struct form) and the
    Arrow pass must give all null rows ONE shared dense rank, not a
    rank each (Arrow hands nullable longs to pandas as NaN, and
    NaN != NaN). Spark's asc = NULLS FIRST, so nulls rank 1."""
    rows = [(None,), (3,), (None,), (1,), (3,), (None,), (2,)]
    df = spark.createDataFrame(rows, "v: int")
    out = ranking.global_dense_rank(
        df, ["v"], rank_col="r", num_partitions=3
    ).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], set()).add(r["r"])
    assert by_v == {None: {1}, 1: {2}, 2: {3}, 3: {4}}
    # multi-column: null in ONE field of the tuple
    rows2 = [(1, None), (1, None), (1, 5), (2, None), (0, 9)]
    df2 = spark.createDataFrame(rows2, "a: int, b: int")
    out2 = {
        (r["a"], r["b"], r["r"])
        for r in ranking.global_dense_rank(
            df2, ["a", "b"], rank_col="r", num_partitions=2
        ).collect()
    }
    assert out2 == {
        (0, 9, 1),
        (1, None, 2),
        (1, 5, 3),
        (2, None, 4),
    }


def test_dense_rank_many_partitions_with_duplicates(spark):
    """Multi-partition stress for the partition-pinning fix: without
    the localCheckpoint, the stats and ranking passes re-execute the
    range exchange with different sampled boundaries (AQE re-plans
    per action) and offsets describe partitions that no longer exist
    — single-partition-sized inputs can never catch that."""
    from pyspark.sql import functions as F

    df = (
        spark.range(50_000)
        .select((F.col("id") % 997).alias("v"))
    )
    got = ranking.global_dense_rank(
        df, ["v"], rank_col="r", num_partitions=16
    )
    # every v in 0..996 appears; dense rank must be exactly v+1
    bad = got.filter(F.col("r") != F.col("v") + 1).count()
    assert bad == 0
    assert got.count() == 50_000


def test_dense_rank_nan_vs_null_float_keys(spark):
    """ADVICE r8: a float order column holding BOTH real NaNs and
    NULLs. Spark's grouping normalization makes all NaNs ONE key
    DISTINCT from NULL (pass 1 counts two keys), and asc sorts
    NULLS FIRST / NaN LAST — the Arrow pass must keep the two
    groups apart too (pandas shows both as NaN) or every later
    partition's offset shifts globally."""
    nan = float("nan")
    rows = [(None,), (nan,), (1.0,), (None,), (nan,), (2.0,), (1.0,)]
    df = spark.createDataFrame(rows, "v: double")
    out = ranking.global_dense_rank(
        df, ["v"], rank_col="r", num_partitions=3
    ).collect()
    by_rank = {}
    for r in out:
        v = r["v"]
        key = (
            "null" if v is None
            else "nan" if v != v
            else v
        )
        by_rank.setdefault(key, set()).add(r["r"])
    assert by_rank == {
        "null": {1}, 1.0: {2}, 2.0: {3}, "nan": {4}
    }
    # and in ONE partition (num_partitions=1): adjacency is where the
    # pre-fix conflation actually merged the two groups
    out1 = ranking.global_dense_rank(
        df, ["v"], rank_col="r", num_partitions=1
    ).collect()
    ranks = sorted({r["r"] for r in out1})
    assert ranks == [1, 2, 3, 4]


def test_exact_substrings_rank_path_matches_brute_force(spark):
    """min_len > 32 takes the rank-pair (prefix-doubling) physical
    path — same semantics as the direct-gram fast path, asserted
    against the same brute-force Counter."""
    import hashlib
    from collections import Counter

    from pyspark_scd_spark.operators import dedup

    base = "The quick brown fox jumps over the lazy dog near the bank"
    docs = [
        (1, "A" + base + "B"),
        (2, "CC" + base + "DD"),  # shares a 58-char run with doc 1
        (3, "totally different content that repeats nothing at all"),
        (4, "x" * 50),  # overlapping self-repeats
        (5, base[:30]),  # shorter than L
    ]
    L = 40
    got = {
        r["doc_id"]: (
            r["n_dup_windows"], r["cut_bytes"], r["kept_len"],
            r["kept_md5"],
        )
        for r in dedup.dedup_exact_substrings(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_len=L
        ).collect()
    }
    grams = Counter(
        t[i : i + L] for _, t in docs for i in range(len(t) - L + 1)
    )
    for d, t in docs:
        starts = [
            i for i in range(len(t) - L + 1)
            if grams[t[i : i + L]] >= 2
        ]
        mask = [False] * len(t)
        for s in starts:
            for j in range(s, s + L):
                mask[j] = True
        kept = "".join(c for c, m in zip(t, mask) if not m)
        assert got[d] == (
            len(starts),
            len(t) - len(kept),
            len(kept),
            hashlib.md5(kept.encode()).hexdigest(),
        ), f"doc {d}"
