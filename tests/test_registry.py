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
