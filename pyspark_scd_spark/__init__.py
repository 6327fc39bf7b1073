"""pyspark_scd_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the capabilities of the
reference repo ``stephanesol/pyspark-scd`` (a slowly-changing-dimension
batch pipeline; see SURVEY.md), generalized into a library of composable
DataFrame transforms, plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
mandated by BASELINE.json.

Design stance (SURVEY.md §7):
- pure functions ``f(df, **params) -> DataFrame`` chained with the
  built-in ``DataFrame.transform`` (native since Spark 3.0 — the
  reference had to monkeypatch it, reference
  jobs/create_employee_all.py:20-27);
- declarative DataFrame/SQL plans so Catalyst handles pushdown,
  pruning, join selection; zero custom Catalyst rules needed;
- every operator designed for a 1000-executor / 100 TB deployment:
  no ``partitionBy(lit(1))`` windows, no ``coalesce(1)`` writes, no
  driver-side collect loops in the hot path.
"""

__version__ = "0.1.0"
