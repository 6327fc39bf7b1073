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
