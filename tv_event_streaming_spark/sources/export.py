"""S13 — the data-dump sink: one JSON export per logical entity.

Reference: scripts/remote_tests/remote_deploy_and_smoke_test.sh:174-204
scans the single table four times with a prefix filter per entity and
writes four JSON files. Here each entity is already a typed DataFrame,
so the dump is a partitioned `write.json` per entity — no scan-filter
passes, and each export parallelizes across executors (coalesce only if
a single file is genuinely required downstream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_ENTITIES = ("sources", "genres", "titles", "user_prefs")


def dump_entities(
    tables: dict[str, DataFrame],
    out_dir: str,
    entities: tuple[str, ...] = DEFAULT_ENTITIES,
    single_file: bool = False,
) -> dict[str, str]:
    """Write each entity to ``<out_dir>/<entity>/`` as JSON lines.
    Returns entity → path. ``single_file`` mirrors the reference's
    one-file-per-entity shape (driver-side coalesce — only for smoke-test
    sized exports)."""
    paths: dict[str, str] = {}
    for name in entities:
        df = tables[name]
        if single_file:
            df = df.coalesce(1)
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").json(path)
        paths[name] = path
    return paths
