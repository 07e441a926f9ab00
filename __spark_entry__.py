"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`apache_flink_pratices_spark.registry`: every operator
from SURVEY.md §2 registers a QuerySpec (Spark callable + DuckDB oracle SQL)
there; this module just re-exports the three driver hooks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_flink_pratices_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _with_deploy(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship the package to the session's Python workers before running:
    queries with mapInPandas/applyInPandasWithState stages need the module
    importable on executors regardless of the host process's cwd."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from apache_flink_pratices_spark.deploy import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return _with_deploy(registry.queries()["q1_pricing_summary"])(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_deploy(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
