"""Vector column math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` / ``aggregate``) —
JVM-side, no Python. Elements are cast to double BEFORE any multiply so
Spark and the DuckDB oracle (``CAST(v AS DOUBLE[])`` +
``list_cosine_similarity``) run identical double-precision arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_dbl(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
