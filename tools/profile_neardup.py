#!/usr/bin/env python3
"""Leg-level profile of the SimHash near-dup pipeline at a given scale
dir (SCALE.md §6e slope follow-up): times signatures, verified pairs,
and (optionally) the CC loop separately, and reports the bucket /
candidate / true-pair statistics that explain WHERE a superlinear
decade comes from — bucket saturation (candidates ≫ pairs: the
blocking scheme is too coarse for N) vs a dense true relation
(pairs ≈ candidates: the OUTPUT is quadratic and no candidate scheme
can help).

Run: python tools/profile_neardup.py [SF_DIR] [N_BLOCKS] [MAX_HAMMING] [--cc]
Defaults: d100 corpus, n_blocks=4 (the catalog quarter scheme),
max_hamming=8, CC loop skipped unless --cc.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from tv_event_streaming_spark.domain import load_table
    from tv_event_streaming_spark.operators import dedup as OD
    from tv_event_streaming_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--cc"]
    run_cc = "--cc" in sys.argv
    sf_dir = args[0] if args else "/tmp/scale_corpus/d100"
    n_blocks = int(args[1]) if len(args) > 1 else 4
    max_hamming = int(args[2]) if len(args) > 2 else 8

    spark = get_spark(app_name="profile-neardup")
    out: dict[str, object] = {
        "sf_dir": sf_dir, "n_blocks": n_blocks, "max_hamming": max_hamming
    }
    docs = load_table(spark, sf_dir, "documents")
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    sigs = OD.simhash_signatures(docs, portable=True).persist()
    out["n_sigs"] = sigs.count()
    out["t_signatures"] = round(time.monotonic() - t0, 3)

    # bucket statistics for the SAME blocked keys simhash_near_pairs
    # uses: how saturated is the blocking at this (N, n_blocks)?
    base, rem = divmod(64, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    offs = [sum(widths[:i]) for i in range(n_blocks)]
    combos = list(itertools.combinations(range(n_blocks), n_blocks - 3))
    keys = []
    for ci, combo in enumerate(combos):
        key, shift = F.lit(0).cast("long"), 0
        for bi in combo:
            blk = F.shiftright("simhash", offs[bi]).bitwiseAND(
                F.lit((1 << widths[bi]) - 1)
            )
            key = key.bitwiseOR(F.shiftleft(blk, shift))
            shift += widths[bi]
        keys.append(F.struct(F.lit(ci).alias("q"), key.alias("quarter")))
    t0 = time.monotonic()
    qstats = (
        sigs.select(F.explode(F.array(*keys)).alias("qq"))
        .groupBy("qq.q", "qq.quarter")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand_pairs"),
        )
        .collect()[0]
    )
    out["n_buckets"] = qstats["n_buckets"]
    out["max_bucket"] = qstats["max_bucket"]
    # upper bound: per-bucket candidates, before cross-table dedup
    out["candidates_upper"] = int(qstats["cand_pairs"])
    out["t_bucket_stats"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pairs = OD.simhash_near_pairs(
        sigs, max_hamming=max_hamming, n_blocks=n_blocks
    ).persist()
    out["n_pairs"] = pairs.count()
    out["t_pairs"] = round(time.monotonic() - t0, 3)

    if run_cc:
        t0 = time.monotonic()
        clusters = OD.neardup_clusters(docs, pairs)
        out["n_clustered_rows"] = clusters.count()
        out["t_cc_loop"] = round(time.monotonic() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
