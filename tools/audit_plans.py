#!/usr/bin/env python3
"""Physical-plan audit over the whole catalog.

For every entry, prints one line: #Exchanges, join strategies, whether a
BroadcastNestedLoopJoin appears (almost always a scale bug unless the
build side is a deliberate 1-row broadcast), and the pushed filters /
read schemas of the parquet scans. Run after plan changes; SCALE.md §2
quotes these results.

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tv_event_streaming_spark.plans import CATALOG  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402

# Iterative entries execute jobs at build() time; everything else is lazy.
SLOW = {
    "neardup_clusters",
    "curation_pipeline_neardup",
    "leakage_safe_splits",
    "knn_pagerank",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    rows = []
    for name, entry in CATALOG.items():
        if name in SLOW and "--all" not in sys.argv:
            rows.append((name, "(skipped: executes at build time; pass --all)"))
            continue
        plan = entry.build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        exchanges = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w+Join)\b", plan)))
        bnlj = "BroadcastNestedLoopJoin" in plan
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        n_pushed = sum(1 for p in pushed if p.strip())
        rows.append(
            (
                name,
                f"exchanges={exchanges} joins={','.join(joins) or '-'} "
                f"{'BNLJ! ' if bnlj else ''}pushed_scans={n_pushed}/{len(pushed)}",
            )
        )
    width = max(len(n) for n, _ in rows)
    for name, desc in rows:
        print(f"{name:<{width}}  {desc}")


if __name__ == "__main__":
    main()
