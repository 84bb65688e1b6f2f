#!/usr/bin/env python3
"""Serving-path crossover: materialized title index vs arrays_overlap scan.

SURVEY J1 notes the inverted index is DERIVABLE: a title matches a
user's prefs iff its source_ids/genre_ids arrays overlap them
(operators/titles.py:titles_by_overlap), because the index is exactly
the cross product of those arrays (reference consumer.py:79-89 put-loop).
So the engine has two serving strategies:

  A. INDEX — materialize (source_id, genre_id, title_id) once, serve a
     read by key lookup + distinct + fetch. Build cost O(sum of array
     cross products); read cost O(matching index rows).
  B. OVERLAP — no materialization; every read scans the titles table
     with the arrays_overlap predicate. Build cost 0; read cost
     O(titles).

This tool measures both at sf0.1 under the TWO array shapes the repo
models, and prints the crossover arithmetic:

  - "selective": the derived 2x2 arrays (domain.title_index) — 4 index
    rows/title, reads touch a small key range.
  - "reference-full": the wire-format arrays the reference producer
    ships (ALL distinct source prefs x ALL genre prefs,
    producer.py:36-47) — sn*gn rows/title = 5*10^8 at sf0.1, and every
    title matches every user, so the index buys NO selectivity.

Reads are timed steady-state (warmup + min of N) into the noop sink,
against PARQUET tables on disk (what a deployment serves from), not
re-derived frames. The index is written partitioned by genre_id so a
read prunes partitions (the build_ivf_index pattern).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from tv_event_streaming_spark.domain import derive_domain  # noqa: E402
from tv_event_streaming_spark.operators.titles import (  # noqa: E402
    api_projection,
    enriched_filter,
    index_from_arrays,
    titles_by_overlap,
)
from tv_event_streaming_spark.session import get_spark  # noqa: E402


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed_read(build, runs: int = 3) -> float:
    _noop(build())  # warmup (codegen/JIT)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _noop(build())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _user_prefs_lists(prefs_df: DataFrame, user_id: str) -> tuple[list, list]:
    rows = prefs_df.filter(F.col("user_id") == user_id).collect()
    us = sorted(r.pref_id for r in rows if r.kind == "source")
    ug = sorted(r.pref_id for r in rows if r.kind == "genre")
    return us, ug


def _index_read(spark, idx_path: str, titles_pq: DataFrame, us, ug) -> DataFrame:
    """Serving read, index strategy: key-range probe (the prefs are
    known driver-side at query time, like query_ivf_index's probe
    cells) -> distinct title ids -> fetch. genre_id is the partition
    key, so the isin shows up as a scan PartitionFilter."""
    idx = spark.read.parquet(idx_path)
    ids = (
        idx.filter(F.col("source_id").isin(us) & F.col("genre_id").isin(ug))
        .select("title_id")
        .distinct()
    )
    return api_projection(enriched_filter(titles_pq).join(ids, "title_id"))


def _overlap_read(titles_pq: DataFrame, us, ug) -> DataFrame:
    return api_projection(enriched_filter(titles_by_overlap(titles_pq, us, ug)))


def bench_model(spark, d, root: str, model: str, n_users: int = 5) -> dict:
    """Build both serving structures for one array shape, time reads."""
    titles = d["titles"]
    prefs = d["user_prefs"]

    if model == "selective":
        # the derived 2x2 arrays: reconstruct per-title arrays from the
        # domain index (they ARE its grouping)
        from tv_event_streaming_spark.operators.titles import arrays_from_index

        arrays = arrays_from_index(d["title_index"])
    else:  # reference-full: every title carries ALL distinct pref ids
        dp = prefs.select("kind", "pref_id").distinct()
        s_row = dp.filter(F.col("kind") == "source").agg(
            F.sort_array(F.collect_set("pref_id")).alias("source_ids")
        )
        g_row = dp.filter(F.col("kind") == "genre").agg(
            F.sort_array(F.collect_set("pref_id")).alias("genre_ids")
        )
        arrays = (
            titles.select("title_id")
            .crossJoin(F.broadcast(s_row))
            .crossJoin(F.broadcast(g_row))
        )

    titles_path = os.path.join(root, f"titles_{model}")
    idx_path = os.path.join(root, f"index_{model}")

    t0 = time.perf_counter()
    titles.join(arrays, "title_id").write.mode("overwrite").parquet(titles_path)
    t_titles_write = round(time.perf_counter() - t0, 3)

    titles_pq = spark.read.parquet(titles_path)
    t0 = time.perf_counter()
    (
        index_from_arrays(titles_pq.select("title_id", "source_ids", "genre_ids"))
        .write.mode("overwrite")
        .partitionBy("genre_id")
        .parquet(idx_path)
    )
    t_index_build = round(time.perf_counter() - t0, 3)

    idx_rows = spark.read.parquet(idx_path).count()
    idx_bytes = sum(
        os.path.getsize(os.path.join(dp_, f))
        for dp_, _, fs in os.walk(idx_path)
        for f in fs
    )

    users = [
        r.user_id
        for r in prefs.select("user_id").distinct().orderBy("user_id").limit(n_users).collect()
    ]
    t_index = []
    t_overlap = []
    for u in users:
        us, ug = _user_prefs_lists(prefs, u)
        if not us or not ug:
            continue
        t_index.append(
            _timed_read(lambda: _index_read(spark, idx_path, titles_pq, us, ug))
        )
        t_overlap.append(_timed_read(lambda: _overlap_read(titles_pq, us, ug)))

    # every sampled user can have empty source/genre prefs (r6 advisor
    # finding: mean() raised ZeroDivisionError and killed the bench
    # before printing); emit null read timings in that case
    mean = lambda xs: round(sum(xs) / len(xs), 3) if xs else None
    out = {
        "model": model,
        "index_rows": idx_rows,
        "index_bytes": idx_bytes,
        "titles_write_sec": t_titles_write,
        "index_build_sec": t_index_build,
        "read_index_sec": mean(t_index),
        "read_overlap_sec": mean(t_overlap),
        "n_read_queries": len(t_index),
    }
    per_read_gain = (
        out["read_overlap_sec"] - out["read_index_sec"] if t_index else None
    )
    out["crossover_reads"] = (
        round(t_index_build / per_read_gain)
        if per_read_gain is not None and per_read_gain > 0
        else None
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    models = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "selective",
        "reference-full",
    ]
    spark = get_spark(app_name="bench-serving")
    d = derive_domain(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="serving_bench_")
    try:
        results = [bench_model(spark, d, root, m) for m in models]
        print(json.dumps({"sf_dir": sf_dir, "models": results}, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
