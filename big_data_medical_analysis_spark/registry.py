"""Named-query registry: the engine's public operator catalog.

Every operator in SURVEY.md §2 is exposed as a named, composable function
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, an ANSI-SQL
oracle twin that DuckDB runs on the same parquet tables. The driver's
correctness harness compares the two (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically in the Spark plan and SQL;
- float aggregates are rounded identically on both sides;
- timestamps are rendered to strings identically on both sides
  (Spark ``date_format`` ↔ DuckDB ``strftime``).

Non-SQL-expressible operators (Bernoulli sampling, engine-hash partitioning,
LSH over engine RNG) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    category: str
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, category: str = "relational"):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, category, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so its @register calls run."""
    # Imported here (not at module top) to avoid import cycles: operator
    # modules import `register` from this module.
    from big_data_medical_analysis_spark.operators import (  # noqa: F401
        dedup,
        etl,
        multimodal,
        relational,
        similarity,
        sketches,
        text_analysis,
        udf_surface,
    )
    from big_data_medical_analysis_spark.streaming import windows  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    """Driver-contract shape: name -> (spark, sf_dir) -> DataFrame."""
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Driver-contract shape: name -> DuckDB SQL (only where expressible)."""
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
