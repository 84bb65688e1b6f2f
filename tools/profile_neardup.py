#!/usr/bin/env python3
"""Leg-level profile of the SimHash near-dup cluster pipeline at a
given scale dir (SCALE.md §6e slope follow-up): times signatures,
candidate generation, verified pairs, and the CC loop separately, and
reports the candidate/pair/bucket statistics that explain WHERE a
superlinear decade comes from (quarter-bucket saturation is the
expected suspect: candidates ~ Σ_bucket C(n,2) ≈ N²/65536 per block).

Run: python tools/profile_neardup.py [SF_DIR]   (default d100 corpus)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_corpus/d100"


def main() -> None:
    from pyspark.sql import functions as F

    from tv_event_streaming_spark.domain import load_table
    from tv_event_streaming_spark.operators import dedup as OD
    from tv_event_streaming_spark.session import get_spark

    spark = get_spark(app_name="profile-neardup")
    out: dict[str, object] = {"sf_dir": SF_DIR}
    docs = load_table(spark, SF_DIR, "documents")
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    sigs = OD.simhash_signatures(docs, portable=True).persist()
    out["n_sigs"] = sigs.count()
    out["t_signatures"] = round(time.monotonic() - t0, 3)

    # quarter-bucket statistics: how saturated is the 16-bit blocking?
    qstats = (
        sigs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(q).alias("q"),
                            F.shiftright("simhash", q * 16)
                            .bitwiseAND(F.lit(0xFFFF))
                            .alias("quarter"),
                        )
                        for q in range(4)
                    ]
                )
            ).alias("qq")
        )
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
    out["expected_candidates"] = int(qstats["cand_pairs"])

    t0 = time.monotonic()
    pairs = OD.simhash_near_pairs(sigs, max_hamming=8).persist()
    out["n_pairs"] = pairs.count()
    out["t_pairs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    clusters = OD.neardup_clusters(docs, pairs)
    out["n_clustered_rows"] = clusters.count()
    out["t_cc_loop"] = round(time.monotonic() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
