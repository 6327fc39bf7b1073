"""Registry-wide guards: every declared query must analyze cleanly and
every oracle key must have a builder."""

from __future__ import annotations

from pyspark_scd_spark.registry import REGISTRY


def test_every_query_analyzes(spark):
    """Building each query forces Catalyst analysis (schema access) —
    catches unresolved columns / bad expressions across the whole
    registry without executing any job. Iterative builders (the merge
    fold) do run small collects; everything else is plan-only."""
    for name, q in REGISTRY.items():
        df = q.builder(spark, "/root/testdata/sf0.001")
        assert df.schema.fields, name
        assert len(df.columns) == len(set(df.columns)), (
            name,
            "duplicate output column names break the oracle compare",
        )


def test_oracle_queries_have_docs():
    for name, q in REGISTRY.items():
        assert q.doc, f"{name} has no doc string"


def test_register_rejects_duplicate_keys():
    """A duplicate key must raise at registration time, not silently
    shadow the earlier builder (a shadowed q6_forecast_revenue shipped
    exactly that way once)."""
    import pytest

    from pyspark_scd_spark.registry import register

    existing = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate registry key"):
        register(existing, None, doc="dup")(lambda spark, sf_dir: None)


def test_profile_columns_unit(spark):
    from pyspark_scd_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "bbb"), (2, "a")],
        ["x", "s"],
    )
    out = {
        (r["col_name"], r["metric"]): r["value"]
        for r in profile_columns(
            df, numeric_cols=["x"], string_cols=["s"]
        ).collect()
    }
    assert out[("*", "n_rows")] == 4.0
    assert out[("x", "n_nulls")] == 1.0
    assert out[("x", "n_distinct")] == 2.0
    assert out[("x", "min")] == 1.0 and out[("x", "max")] == 2.0
    assert out[("s", "n_nulls")] == 1.0
    assert out[("s", "avg_len")] == round((1 + 3 + 1) / 3, 6)


def test_fk_orphans_unit(spark):
    from pyspark_scd_spark.operators.quality import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    got = fk_orphans(child, parent, ["fk"], ["pk"]).collect()
    # 99 is an orphan; NULL fk is excluded per SQL FK semantics
    assert [(r["id"], r["fk"]) for r in got] == [(3, 99)]


def test_basket_lift_symmetry(spark):
    from pyspark_scd_spark.operators.relational import basket_lift_pairs

    rows = [  # baskets: {1: a,b,c}, {2: a,b}, {3: a}, {4: b,c}
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r["item_a"], r["item_b"]): r
           for r in basket_lift_pairs(df, "basket", "item",
                                      min_pair_count=2).collect()}
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2
    assert ab["support"] == 0.5            # 2 of 4 baskets
    assert abs(ab["confidence_a_to_b"] - 2 / 3) < 1e-6
    assert abs(ab["lift"] - (2 * 4) / (3 * 3)) < 1e-6
    bc = out[("b", "c")]
    assert bc["pair_count"] == 2 and abs(bc["lift"] - (2 * 4) / (3 * 2)) < 1e-6
    assert ("a", "c") not in out           # count 1 < min_pair_count


def test_category_drift_chisq_zero_cells(spark):
    from pyspark_scd_spark.operators.quality import category_drift_chisq

    rows = (
        [("s1", "en")] * 50 + [("s1", "fr")] * 50
        + [("s2", "en")] * 100          # s2 has ZERO fr rows
    )
    df = spark.createDataFrame(rows, ["source", "lang"])
    out = {r["source"]: r for r in
           category_drift_chisq(df, "source", "lang").collect()}
    # margins: en=150 fr=50 N=200. s2: exp en=75 fr=25,
    # chi2 = 25^2/75 + 25^2/25 = 8.3333 + 25 = 33.3333; with two
    # groups the deviations mirror, so s1 carries the same statistic.
    assert out["s2"]["dof"] == 1
    assert abs(out["s2"]["chi_square"] - 33.3333) < 1e-3
    assert abs(out["s1"]["chi_square"] - 33.3333) < 1e-3


def test_schema_diff(spark):
    from pyspark.sql import functions as F

    from pyspark_scd_spark.operators.quality import schema_diff

    a = spark.createDataFrame([(1, "x", 1.0)], "id int, name string, v double")
    b = spark.createDataFrame(
        [(1, "x", 2)], "id int, name string, v int"
    ).withColumn("extra", F.lit(1))
    out = {r["column"]: r for r in schema_diff(a, b).collect()}
    assert out["v"]["change"] == "type_changed"
    assert out["v"]["before"] == "double" and out["v"]["after"] == "int"
    assert out["extra"]["change"] == "added"
    assert "id" not in out and "name" not in out
    # symmetric: removed from the other direction
    back = {r["column"]: r for r in schema_diff(b, a).collect()}
    assert back["extra"]["change"] == "removed"
