"""Structured Streaming pipelines (SURVEY.md §2.8, §3.2).

The reference's three async stages map to:

- ``producer``    the daily batch job: prefs → distinct-union → title
                  lookup → envelope → event sink (stage 1).
- ``consumer``    events stream → decode/validate/dedup → idempotent
                  MERGE of canonical titles + index derivation (stage 2).
- ``enrichment``  title-table change feed, INSERT-only → details join →
                  field-level MERGE (stage 3; the INSERT filter breaks
                  the self-referential CDC loop, reference
                  enrichment.py:88-89).
- ``storage``     the MERGE/CDC substrate: versioned keyed parquet
                  tables with a change journal (poor-man's Delta; swap
                  for Delta/Iceberg MERGE + CDF on a real deployment).
"""

from .storage import KeyedTable  # noqa: F401
