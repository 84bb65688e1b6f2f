#!/usr/bin/env python3
"""Time individual catalog entries exactly like bench.py does (untimed
cold run, then min of N steady-state runs into the noop sink, cache
cleared before every timed attempt), without paying for the whole
catalog. For quick A/B loops during optimization work.

    python tools/time_entries.py [-n 3] entry [entry ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tv_event_streaming_spark.plans import CATALOG  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — same sampling
    bench.py uses for its per-attempt steal witness."""
    with open("/proc/stat") as fh:
        vals = list(map(int, fh.readline().split()[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-entries")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        entry = CATALOG[name]
        spark.sparkContext.setJobDescription(f"time_entries: {name}")
        t0 = time.perf_counter()
        entry.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        best, best_steal, attempts = float("inf"), 0.0, []
        for _ in range(n):
            spark.catalog.clearCache()
            time.sleep(0.3)
            s0, tt0 = _cpu_ticks()
            t1 = time.perf_counter()
            entry.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t1
            s1, tt1 = _cpu_ticks()
            steal = 100.0 * (s1 - s0) / max(1, tt1 - tt0)
            attempts.append((wall, steal))
            if wall < best:
                best, best_steal = wall, steal
        spark.catalog.clearCache()
        detail = " ".join(f"{w:.2f}@{s:.1f}%" for w, s in attempts)
        print(
            f"{name}: {best:.3f}s (steal@min {best_steal:.1f}%, "
            f"cold {cold:.3f}s, attempts: {detail})"
        )


if __name__ == "__main__":
    main()
