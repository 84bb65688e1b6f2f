#!/usr/bin/env python3
"""Bench the streaming cascade (producer → consumer → CDC enrichment) —
the path the reference bounds at ≤90 s end-to-end
(remote_deploy_and_smoke_test.sh:143-144), its only published latency
anchor. Prints one JSON line with per-stage seconds, end-to-end
seconds, and rows/s through the canonical store.

Standalone: `python tools/bench_streaming.py [sf_dir]`. bench.py embeds
the same function and reports it under the "streaming" key.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_cascade(spark, sf_dir: str, fetch_limit: int = 20) -> dict:
    """Defaults to the reference's API_FETCH_LIMIT=20 — the exact config
    its ≤90 s smoke-test allowance bounds, so total_sec compares
    directly. Pass a large fetch_limit for the full-corpus throughput
    run (sf0.1: 20 000 titles → 5·10^8 index rows in 383 s end-to-end,
    ~1.4 M index rows/s — SCALE.md §6c)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from tv_event_streaming_spark.domain import derive_domain  # noqa: PLC0415
    from tv_event_streaming_spark.streaming.consumer import (  # noqa: PLC0415
        index_table,
        start_consumer,
        titles_table,
    )
    from tv_event_streaming_spark.streaming.enrichment import (  # noqa: PLC0415
        start_enrichment,
    )
    from tv_event_streaming_spark.streaming.producer import (  # noqa: PLC0415
        build_title_events,
        publish,
    )

    import bench  # noqa: PLC0415 — steal meter (lazy: bench loads CATALOG)

    root = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        steal0 = bench._proc_stat()
        d = derive_domain(spark, sf_dir)
        lookup = d["titles"].select(
            F.col("title_id").alias("id"),
            "title",
            F.col("year").cast("int").alias("year"),
            F.concat(F.lit("tt"), F.col("title_id").cast("string")).alias(
                "imdb_id"
            ),
            (F.col("title_id") * 2).alias("tmdb_id"),
            F.lit("tv").alias("tmdb_type"),
            "type",
        )
        events_dir = os.path.join(root, "events")

        t0 = time.perf_counter()
        events = build_title_events(
            d["user_prefs"], lookup, fetch_limit=fetch_limit
        )
        publish(events, events_dir)
        t_produce = time.perf_counter() - t0

        titles = titles_table(spark, os.path.join(root, "titles"))
        index = index_table(spark, os.path.join(root, "index"))
        t1 = time.perf_counter()
        q = start_consumer(
            spark, events_dir, titles, index, os.path.join(root, "ckpt_c")
        )
        q.awaitTermination()
        t_consume = time.perf_counter() - t1

        t2 = time.perf_counter()
        q2 = start_enrichment(
            spark, titles, d["details"], os.path.join(root, "ckpt_e")
        )
        q2.awaitTermination()
        t_enrich = time.perf_counter() - t2

        n_titles = titles.read().count()
        n_index = index.read().count()
        total = t_produce + t_consume + t_enrich
        return {
            "produce_sec": round(t_produce, 3),
            "consume_sec": round(t_consume, 3),
            "enrich_sec": round(t_enrich, 3),
            "total_sec": round(total, 3),
            "titles_rows": n_titles,
            "index_rows": n_index,
            "rows_per_sec": round(n_titles / total, 1) if total else None,
            "index_rows_per_sec": round(n_index / total, 1) if total else None,
            # hypervisor steal over the whole cascade window (r12: the
            # r11 cold/warm calibration spread is host-band; this makes
            # the disposition mechanical, same meter as the catalog leg)
            "steal_pct": bench._steal_pct(steal0, bench._proc_stat()),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from tv_event_streaming_spark.session import get_spark  # noqa: PLC0415

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="bench-streaming")
    print(json.dumps({"streaming_cascade": bench_cascade(spark, sf_dir), "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
