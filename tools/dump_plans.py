#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for catalog entries to a directory.

    python tools/dump_plans.py plans/r12 _before [entry ...]

Writes ``<outdir>/<entry><suffix>.txt`` for each named entry (default:
every entry in the catalog). Iterative entries (cluster loops, PageRank)
execute jobs at build() time; they are included — the captured plan is
the FINAL frame's plan, which is what the result's cost shape is.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tv_event_streaming_spark.plans import CATALOG  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or list(CATALOG)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    for name in names:
        entry = CATALOG[name]
        try:
            df = entry.build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc}"
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
