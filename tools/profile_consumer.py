#!/usr/bin/env python3
"""Attribute the cascade's consumer leg (VERDICT r6 #7): per-stage
breakdown of the consumer stream's wall time — decode+dedup
materialization vs titles MERGE vs index derive+MERGE vs stream
machinery (file listing, offset log, trigger scheduling) — at
reference-parity batch sizes and at a larger fetch_limit to show how
the attribution shifts with data volume.

Method: run the REAL consumer (start_consumer with stage_timings) over
the REAL producer bus; `overhead_sec` = stream wall time minus the sum
of in-process stages. Prints one JSON line per config.

Run: `python tools/profile_consumer.py [sf_dir] [fetch_limit ...]`
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, sf_dir: str, fetch_limit: int) -> dict:
    from pyspark.sql import functions as F  # noqa: PLC0415

    from tv_event_streaming_spark.domain import derive_domain  # noqa: PLC0415
    from tv_event_streaming_spark.streaming.consumer import (  # noqa: PLC0415
        index_table,
        start_consumer,
        titles_table,
    )
    from tv_event_streaming_spark.streaming.producer import (  # noqa: PLC0415
        build_title_events,
        publish,
    )

    root = tempfile.mkdtemp(prefix="consumer_prof_")
    try:
        d = derive_domain(spark, sf_dir)
        lookup = d["titles"].select(
            F.col("title_id").alias("id"),
            "title",
            F.col("year").cast("int").alias("year"),
            F.concat(F.lit("tt"), F.col("title_id").cast("string")).alias("imdb_id"),
            (F.col("title_id") * 2).alias("tmdb_id"),
            F.lit("tv").alias("tmdb_type"),
            "type",
        )
        events_dir = os.path.join(root, "events")
        publish(
            build_title_events(d["user_prefs"], lookup, fetch_limit=fetch_limit),
            events_dir,
        )

        titles = titles_table(spark, os.path.join(root, "titles"))
        index = index_table(spark, os.path.join(root, "index"))
        timings: dict = {}
        t0 = time.perf_counter()
        q = start_consumer(
            spark,
            events_dir,
            titles,
            index,
            os.path.join(root, "ckpt"),
            stage_timings=timings,
        )
        # bounded like the test suite's drains: a wedged stream should
        # fail the profiling run fast, not hang it forever
        assert q.awaitTermination(600), "consumer did not drain in 600s"
        wall = time.perf_counter() - t0
        in_process = (
            timings.get("materialize_sec", 0.0)
            + timings.get("titles_merge_sec", 0.0)
            + timings.get("index_merge_sec", 0.0)
        )
        return {
            "fetch_limit": fetch_limit,
            "consume_wall_sec": round(wall, 3),
            "materialize_sec": round(timings.get("materialize_sec", 0.0), 3),
            "titles_merge_sec": round(timings.get("titles_merge_sec", 0.0), 3),
            "index_merge_sec": round(timings.get("index_merge_sec", 0.0), 3),
            # index MERGE phase split (KeyedTable.upsert timings):
            # probe = dedup-shuffle map side + emptiness probe,
            # touched = dedup completion into cache + bucket-id collect,
            # publish = touched-bucket read + merge joins + data write
            "index_probe_sec": round(timings.get("probe_sec", 0.0), 3),
            "index_touched_sec": round(timings.get("touched_sec", 0.0), 3),
            "index_publish_sec": round(timings.get("publish_sec", 0.0), 3),
            "stream_overhead_sec": round(wall - in_process, 3),
            "n_batches": timings.get("n_batches", 0),
            "rows": timings.get("rows", 0),
            "index_rows": index.read().count(),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from tv_event_streaming_spark.session import get_spark  # noqa: PLC0415

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    limits = [int(x) for x in sys.argv[2:]] or [20, 2000]
    spark = get_spark(app_name="profile-consumer")
    for fl in limits:
        print(json.dumps({"consumer_profile": profile(spark, sf_dir, fl)}), flush=True)


if __name__ == "__main__":
    main()
