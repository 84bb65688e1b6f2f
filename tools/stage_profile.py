#!/usr/bin/env python3
"""Per-entry stage profile: run catalog entries into the noop sink and
report, for each Spark stage the entry ran, its task count and summed
executor run time — the mechanical "is the CPU-heavy stage running on
1 of N cores?" witness (guide §1.1/§2.5). Uses the live UI REST API of
the session this script owns; warm run (one untimed cold pass first).

    python tools/stage_profile.py entry [entry ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

The urllib calls go ONLY to the session's own UI (uiWebUrl =
http://127.0.0.1:<port>, same process tree) — this tool never touches
the network; it is the REST form of clicking the local Stages tab.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tv_event_streaming_spark.plans import CATALOG  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402


def _stages(ui: str, app: str) -> dict[int, dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        rows = json.load(r)
    return {s["stageId"]: s for s in rows}


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="stage-profile",
        extra_conf={"spark.ui.enabled": "true"},  # REST API is the witness
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    for name in names:
        entry = CATALOG[name]
        spark.sparkContext.setJobDescription(f"stage_profile cold: {name}")
        entry.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        time.sleep(0.3)
        before = set(_stages(ui, app))
        spark.sparkContext.setJobDescription(f"stage_profile: {name}")
        t0 = time.perf_counter()
        entry.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.2)
        stages = _stages(ui, app)
        new = [stages[i] for i in sorted(set(stages) - before)]
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages ===")
        for s in sorted(new, key=lambda s: -s.get("executorRunTime", 0)):
            rt = s.get("executorRunTime", 0) / 1000.0
            if rt < 0.05:
                continue
            print(
                f"  stage {s['stageId']:4d}: tasks={s['numCompleteTasks']:3d} "
                f"runtime={rt:7.2f}s  {s.get('name', '')[:70]}"
            )


if __name__ == "__main__":
    main()
