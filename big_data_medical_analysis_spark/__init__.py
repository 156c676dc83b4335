"""big_data_medical_analysis_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capability surface of the
reference repo Romanhessec/big-data-medical-analysis (a CheXpert federated-
learning preprocessing pipeline), extended with the relational / streaming /
LLM-data-pipeline operators a 100 TB training-data platform needs.

Design stance (SURVEY.md §7.0):
- DataFrame/SQL only in the data plane; Catalyst + AQE do the physical planning.
- Explicit StructType schemas for every source — no inference.
- Parquet-native storage; CSV/JSON supported as ingest formats.
- UDFs are pure and Arrow-vectorized; writes happen only at explicit sinks.
- Every operator is a named, composable function ``(spark, sf_dir) -> DataFrame``
  registered in ``registry.QUERIES`` with a DuckDB oracle twin where
  SQL-expressible.
"""

from big_data_medical_analysis_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
