"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`geomesa_spark.contract`, which holds every
``queries()`` entry (Spark impl) and its DuckDB ``oracle_sql()`` twin.
See SURVEY.md §5.2 for the oracle design rules that make exact
value-hash matches possible across Spark and DuckDB.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomesa_spark import contract as _contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Common-Crawl-shaped pages → geo-entity extraction →
    gazetteer geocode → broadcast PIP join → per-polygon page counts."""
    return _contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _contract.queries()


def oracle_sql() -> dict[str, str]:
    return _contract.oracle_sql()
