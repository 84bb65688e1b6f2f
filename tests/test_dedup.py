"""Semantic tests for the non-SQL-expressible dedup tiers: inject known
exact/near duplicates into the documents table and verify each tier
finds them (the driver's rows-only check can't see semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tv_event_streaming_spark.domain import load_table
from tv_event_streaming_spark.operators import dedup as D

OFFSET = 1_000_000


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents").limit(100).cache()
    exact = base.select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    # near-dup: append two tokens -> 3-gram Jaccard ~ (n-2)/(n+3), still > 0.8
    near = base.select(
        (F.col("doc_id") + 2 * OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended tail")).alias("text"),
    )
    return base.select("doc_id", "text").unionAll(exact).unionAll(near)


def test_exact_duplicates(spark, docs_with_dups):
    groups = D.exact_duplicates(docs_with_dups).filter(F.col("n_copies") > 1)
    rows = groups.collect()
    assert len(rows) == 100  # every base doc has exactly one exact copy
    assert all(r.n_copies == 2 for r in rows)
    assert all(r.keeper_id < OFFSET for r in rows)  # keeper is the original


def test_minhash_dedup_finds_injected_pairs(spark, docs_with_dups):
    found = D.minhash_dedup(docs_with_dups, threshold=0.7).collect()
    pairs = {(r.doc_a, r.doc_b) for r in found}
    # every exact copy (jaccard 1.0) must be found
    exact_found = {(a, b) for a, b in pairs if a < OFFSET and b == a + OFFSET}
    assert len(exact_found) >= 95, f"exact-copy recall too low: {len(exact_found)}/100"
    # near-dups (appended tail) should mostly be found too
    near_found = {(a, b) for a, b in pairs if a < OFFSET and b == a + 2 * OFFSET}
    assert len(near_found) >= 80, f"near-dup recall too low: {len(near_found)}/100"
    # precision: everything returned really has jaccard >= 0.7
    assert all(r.jaccard >= 0.7 for r in found)


def test_simhash_near_pairs(spark, docs_with_dups):
    sigs = D.simhash_signatures(docs_with_dups)
    pairs = D.simhash_near_pairs(sigs, max_hamming=8).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # exact copies have identical simhash -> hamming 0, always found
    exact_found = {(a, b) for a, b in got if a < OFFSET and b == a + OFFSET}
    assert len(exact_found) == 100
    zero = [r for r in pairs if r.doc_a < OFFSET and r.doc_b == r.doc_a + OFFSET]
    assert all(r.hamming == 0 for r in zero)


def test_ngram_jaccard_exactness(spark, docs_with_dups):
    pairs = D.ngram_jaccard_pairs(docs_with_dups).filter(
        (F.col("doc_a") < OFFSET) & (F.col("doc_b") == F.col("doc_a") + OFFSET)
    )
    rows = pairs.collect()
    # exact copies: identical shingle sets -> jaccard exactly 1.0
    assert len(rows) == 100
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in rows)
    near = D.ngram_jaccard_pairs(docs_with_dups).filter(
        (F.col("doc_a") < OFFSET) & (F.col("doc_b") == F.col("doc_a") + 2 * OFFSET)
    ).collect()
    # appended-tail near-dups: high but strictly sub-1.0 jaccard
    assert len(near) == 100
    assert all(0.5 < r.jaccard < 1.0 for r in near)
