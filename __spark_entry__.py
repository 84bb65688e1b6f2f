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

# Entries the round-2 driver never reached (its check stopped at 50 of
# 56; these were the last 6 in registration order, three with a round-1
# failure history). They go FIRST so a bounded check budget always
# covers the highest-risk entries; the rest follow in registration
# order.
_CHECK_FIRST = (
    "simhash_signatures",
    "simhash_neardup",
    "neardup_clusters",
    "ann_cosine_lsh",
    "embedding_neardup_topk",
    "multimodal_features",
)


def _ordered_names() -> list[str]:
    first = [n for n in _CHECK_FIRST if n in CATALOG]
    return first + [n for n in CATALOG if n not in _CHECK_FIRST]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["titles_for_users"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: CATALOG[n].build for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible entry."""
    return {
        n: CATALOG[n].oracle
        for n in _ordered_names()
        if CATALOG[n].oracle is not None
    }
