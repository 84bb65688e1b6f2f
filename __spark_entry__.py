"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §3.1 J1) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``tv_event_streaming_spark.plans.catalog`` — every implemented operator
from SURVEY.md §2 as a (Spark plan, DuckDB-oracle SQL) pair.

Ordering rule (the driver's correctness budget is bounded — round 2
stopped at 50 of 56, round 3 at 50 of 62 — so the check must always
reach the highest-risk entries first):

1. entries with NO driver-green row in any ``CORRECTNESS_r*.json``
   (brand-new or historically failing), in registration order;
2. entries whose implementation changed since their last driver-green
   round (``_TOUCHED_SINCE_GREEN``, maintained per round) — their old
   evidence is stale;
3. everything else, least-recently-verified first (ascending last-green
   round), ties in registration order — so a budget cutoff always drops
   the entries with the FRESHEST evidence.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tv_event_streaming_spark.plans import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Entries whose implementing code changed after the round recorded in
# their most recent driver-green CORRECTNESS row, making that evidence
# stale. Update each round: add anything rewritten this round, remove
# anything the new CORRECTNESS file re-greens.
#   round 4: minhash* changed in r3 (repartition-before-hash, persisted
#   shingle frame) after their r2 green; changed in r4 after their r3
#   green: neardup_clusters (loop retuned), scalar_functions (reverted
#   to get_json_object), simhash_neardup / ngram_jaccard_topk /
#   embedding_neardup_topk (persist-level changes in their builders),
#   multimodal_features (extract_features decoder-resolution fix).
_TOUCHED_SINCE_GREEN = (
    "minhash_signatures",
    "minhash_neardup",
    "neardup_clusters",
    "scalar_functions",
    "simhash_neardup",
    "ngram_jaccard_topk",
    "embedding_neardup_topk",
    "multimodal_features",
)


def _last_green() -> dict[str, int]:
    """Highest round with a fully-green driver row, per entry."""
    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _ordered_names() -> list[str]:
    green = _last_green()
    reg_index = {n: i for i, n in enumerate(CATALOG)}

    def risk_key(name: str) -> tuple[int, int]:
        # 0 = never green or stale (must re-check); else last green round.
        if name not in green or name in _TOUCHED_SINCE_GREEN:
            return (0, reg_index[name])
        return (green[name], reg_index[name])

    return sorted(CATALOG, key=risk_key)


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
