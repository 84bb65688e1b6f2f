"""Semantic tests for similarity search: the LSH path must retrieve
injected near-identical vectors, and agree with brute force on them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tv_event_streaming_spark.domain import load_table
from tv_event_streaming_spark.operators import similarity as S

OFFSET = 1_000_000


@pytest.fixture(scope="module")
def emb_with_twins(spark, sf_dir):
    base = load_table(spark, sf_dir, "embeddings").limit(50)
    twins = base.select(
        (F.col("vec_id") + OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
        "label",
    )
    return base.unionAll(twins).cache()


def test_bruteforce_finds_twin_as_top1(spark, emb_with_twins):
    topk = S.cosine_topk_bruteforce(emb_with_twins, F.col("vec_id") < 5, k=1)
    rows = {r.query_id: r for r in topk.collect()}
    for q in range(5):
        assert rows[q].neighbor_id == q + OFFSET, (
            f"query {q}: expected its scaled twin, got {rows[q].neighbor_id}"
        )
        assert rows[q].cos_sim > 0.999999


def test_lsh_finds_twin(spark, emb_with_twins):
    # a scaled twin lands in the same hyperplane bucket (signs unchanged),
    # so LSH must retrieve it as top-1 despite pruning the corpus
    topk = S.cosine_topk_lsh(emb_with_twins, F.col("vec_id") < 5, k=1, dims=64, bits=8)
    rows = {r.query_id: r for r in topk.collect()}
    for q in range(5):
        assert rows[q].neighbor_id == q + OFFSET


def test_lsh_prunes_candidates(spark, emb_with_twins):
    brute = S.cosine_topk_bruteforce(emb_with_twins, F.col("vec_id") < 5, k=5)
    lsh = S.cosine_topk_lsh(emb_with_twins, F.col("vec_id") < 5, k=5, dims=64, bits=8)
    nb, nl = brute.count(), lsh.count()
    assert nb == 25
    assert 5 <= nl <= 25  # bucketing prunes, may return fewer than k per query


def test_near_duplicate_threshold(spark, emb_with_twins):
    pairs = S.embedding_near_duplicates(emb_with_twins, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(i, i + OFFSET) for i in range(50)}
    assert expected <= got
