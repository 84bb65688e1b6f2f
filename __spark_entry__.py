"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §3.1 J1) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``tv_event_streaming_spark.plans.catalog`` — every implemented operator
from SURVEY.md §2 as a (Spark plan, DuckDB-oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tv_event_streaming_spark.plans import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["titles_for_users"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.build for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible entry."""
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
