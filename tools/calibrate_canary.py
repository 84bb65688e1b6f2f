#!/usr/bin/env python3
"""Measure the run-to-run spread of bench.py's two canaries (VERDICT
r7 #4: the 0.5 s canary's own variance was unmeasured while it was
being used as the normalization divisor). One fresh session, warmup,
then N individually-timed runs of each canary plan (the plans are the
bench.py functions' own builders — imported, not copied). Prints one
JSON line per canary with raw samples + min/median/max/CV.

Run solo (`python tools/calibrate_canary.py [n_runs]`, default 7).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402


def _samples(fn, spark, n: int) -> list[float]:
    """fn is bench.canary / bench.canary_sustained — each call is
    (1 untimed warm + min-of-3); sampling the FUNCTION output measures
    the spread of the statistic bench.py actually records."""
    return [fn(spark) for _ in range(n)]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="calibrate-canary")
    bench.warmup(spark)
    for name, fn in (("canary_sec", bench.canary), ("canary5_sec", bench.canary_sustained)):
        t0 = time.perf_counter()
        xs = _samples(fn, spark, n)
        mean = statistics.fmean(xs)
        print(
            json.dumps(
                {
                    "canary": name,
                    "samples": xs,
                    "min": min(xs),
                    "median": statistics.median(xs),
                    "max": max(xs),
                    "cv_pct": round(100 * statistics.pstdev(xs) / mean, 2),
                    "spread_pct": round(100 * (max(xs) - min(xs)) / min(xs), 2),
                    "wall_sec": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
