"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §3.1 J1) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``tv_event_streaming_spark.plans.catalog`` — every implemented operator
from SURVEY.md §2 as a (Spark plan, DuckDB-oracle SQL) pair.

Ordering rule (the driver's correctness budget is bounded — round 2
stopped at 50 of 56, round 3 at 50 of 62 — so the check must always
reach the highest-risk entries first), three STRICT tiers:

1. entries with NO driver-green row in any ``CORRECTNESS_r*.json``
   (brand-new or historically failing), in registration order;
2. entries whose implementation changed since their last driver-green
   round — their old evidence is stale. Staleness is MECHANICAL, not
   curated (rounds 2-4 used a hand-maintained tuple; a forgotten entry
   would silently carry stale evidence): an entry is stale iff its
   content fingerprint (build-fn source + oracle SQL + the SOURCES of
   every package function/class it can transitively reach, with
   whole-module-file fallback only for statically-unresolvable
   references — see ``tv_event_streaming_spark/evidence.py``) differs
   from the fingerprint of its last-green round's git tree, recorded in
   ``EVIDENCE.json`` by ``tools/update_evidence.py``. Re-greened
   entries age out automatically when the tool absorbs the new
   CORRECTNESS file (run at round start; test-gated);
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


def _stale() -> set[str]:
    """Entries whose live fingerprint differs from their last-green
    round's recorded one (empty on any failure — ordering then degrades
    to tiers 1+3, never crashes the driver contract). The IMPORT sits
    inside the guard too: a broken evidence.py must degrade the
    ordering, not crash queries()."""
    try:
        from tv_event_streaming_spark.evidence import stale_entries

        return stale_entries()
    except Exception:
        return set()


def _ordered_names() -> list[str]:
    green = _last_green()
    stale = _stale()
    reg_index = {n: i for i, n in enumerate(CATALOG)}

    def risk_key(name: str) -> tuple[int, int, int]:
        # strict tiers: never-green < stale-evidence < by last green round
        if name not in green:
            return (0, 0, reg_index[name])
        if name in stale:
            return (1, 0, reg_index[name])
        return (2, green[name], reg_index[name])

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
