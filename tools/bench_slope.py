#!/usr/bin/env python3
"""Measure the scaling SLOPE of the heaviest catalog entries
(VERDICT r6 #4): solo-bench each entry at sf0.001 / sf0.01 / sf0.1 and
report sec-vs-rows growth, so the 100 TB claims rest on measurement,
not plan audits alone. A ≲linear slope (t ~ rows^e, e ≲ 1) over the
100× documents/embeddings range is the pass bar; superlinear growth
flags a pair-blowup or loop pathology.

Timing per (entry, sf): one untimed warm run, then min of 3
steady-state runs with attempt-scoped cache clears (the bench.py
discipline). Prints one JSON line per entry with per-sf seconds and
the fitted log-log exponent between the extreme scale points.

Run: `python tools/bench_slope.py [entry ...]` (defaults to the 8
heaviest from BENCH_r06).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "curation_pipeline_neardup",
    "neardup_clusters",
    "leakage_safe_splits",
    "ngram_containment_topk",
    "docs_bow_cosine_topk",
    "knn_pagerank",
    "ann_ivfpq_residual",
    "ann_pq_opq",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    import bench  # noqa: PLC0415
    from tv_event_streaming_spark.plans import CATALOG  # noqa: PLC0415
    from tv_event_streaming_spark.session import get_spark  # noqa: PLC0415

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_spark(app_name="bench-slope")
    bench.warmup(spark)

    # rows of the table family the heavy entries read (documents /
    # embeddings share cardinality per sf)
    doc_rows = {}
    for sf_dir in SF_DIRS:
        doc_rows[sf_dir] = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()

    for name in entries:
        e = CATALOG[name]
        per_sf = {}
        for sf_dir in SF_DIRS:
            e.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                time.sleep(0.3)
                t0 = time.perf_counter()
                e.build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            per_sf[sf_dir.rsplit("/", 1)[-1]] = round(best, 3)
            spark.catalog.clearCache()
        sfs = [d.rsplit("/", 1)[-1] for d in SF_DIRS]
        r_lo, r_hi = doc_rows[SF_DIRS[0]], doc_rows[SF_DIRS[-1]]
        t_lo, t_hi = per_sf[sfs[0]], per_sf[sfs[-1]]
        # log-log exponent between the extreme points; fixed per-query
        # overhead (session, planning) inflates t_lo, so this UNDERSTATES
        # data-dependent growth at small t — read alongside the raw row
        exponent = (
            round(math.log(t_hi / t_lo) / math.log(r_hi / r_lo), 3)
            if t_lo > 0
            else None
        )
        print(
            json.dumps(
                {
                    "entry": name,
                    "sec": per_sf,
                    "rows": {s: doc_rows[d] for s, d in zip(sfs, SF_DIRS)},
                    "loglog_exponent": exponent,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
