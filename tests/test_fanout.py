"""Focused tests for the r12 scan fan-out helper and the featurehash
rewrite it shipped with (OPTIMIZATION_r12.md).

The fan-out gate is a scale-behavior contract: it MUST fire on the
unsplittable single-row-group test files (that is the whole point) and
MUST NOT fire when the estimated scan parallelism covers the cores —
a repartition added at cluster scale would be a new shuffle on every
map-side operator that uses the helper.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tv_event_streaming_spark.operators import text as TX
from tv_event_streaming_spark.operators.fanout import (
    estimated_scan_tasks,
    fan_out_scan,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fan_out_fires_on_tiny_unsplittable_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert estimated_scan_tasks(docs) == 1
    out = fan_out_scan(docs, "doc_id")
    plan = _plan(out)
    assert "Exchange hashpartitioning(doc_id" in plan


def test_fan_out_is_noop_when_scan_parallelizes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = "spark.sql.files.maxPartitionBytes"
    saved = spark.conf.get(key)
    try:
        # tiny split target → estimated tasks >= cores → helper must
        # return the frame UNCHANGED (cluster-regime behavior)
        spark.conf.set(key, "1k")
        assert estimated_scan_tasks(docs) >= 8
        out = fan_out_scan(docs, "doc_id")
        assert out is docs
        assert "Exchange" not in _plan(out)
    finally:
        spark.conf.set(key, saved)


def test_fan_out_is_noop_on_in_memory_frames(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    assert estimated_scan_tasks(df) is None
    assert fan_out_scan(df, "doc_id") is df


def test_fan_out_is_noop_when_key_column_absent(spark, sf_dir):
    # ADVICE r12: generic operators hardcode their domain's id column;
    # a frame without it must lose the fan-out, not raise — and only a
    # STRING key is checkable (Column keys go to the analyzer as before)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert estimated_scan_tasks(docs) == 1  # the fan WOULD fire
    renamed = docs.withColumnRenamed("doc_id", "other_id")
    assert fan_out_scan(renamed, "doc_id") is renamed
    # a Column key stays uncheckable and still goes to the analyzer
    out = fan_out_scan(renamed, F.col("other_id"))
    assert "Exchange hashpartitioning(other_id" in _plan(out)


def test_featurehash_dense_null_empty_and_count_semantics(spark):
    """The r12 sparse-aggregate rebuild must keep the dense operator's
    exact legacy semantics: NULL text → NULL embedding row (the old
    fold over a NULL token array), empty text → split('') = [''] so
    ONE phantom-token count, real text → exact integer counts summing
    to the token count."""
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a b a")], "doc_id long, text string"
    )
    for portable in (False, True):
        rows = {
            r["doc_id"]: r["embedding"]
            for r in TX.featurehash_embeddings(
                docs, dims=16, portable=portable
            ).collect()
        }
        assert set(rows) == {0, 1, 2}
        assert rows[0] is None  # NULL text keeps its NULL-embedding row
        assert sum(rows[1]) == 1.0  # the one phantom '' token
        assert sum(rows[2]) == 3.0 and max(rows[2]) >= 2.0  # a×2, b×1
        assert all(len(v) == 16 for v in (rows[1], rows[2]))


def test_featurehash_sparse_matches_dense_posexplode(spark, sf_dir):
    """featurehash_sparse must emit exactly the rows the entry's old
    posexplode-the-dense-vector form produced (this is what keeps the
    oracle hash identical)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dense = TX.featurehash_embeddings(docs, dims=64, portable=True)
    ref = (
        dense.select("doc_id", F.posexplode("embedding").alias("dim", "_c"))
        .filter(F.col("_c") > 0)
        .select("doc_id", "dim", F.col("_c").cast("int").alias("cnt"))
        .orderBy("doc_id", "dim")
        .collect()
    )
    got = (
        TX.featurehash_sparse(docs, dims=64, portable=True)
        .orderBy("doc_id", "dim")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
    assert len(got) > 0
