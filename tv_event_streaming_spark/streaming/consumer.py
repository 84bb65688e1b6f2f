"""Stage 2 — the title-recommendations consumer stream (SURVEY.md §3.2).

Reference: src/title_recommendations_consumer/consumer.py:30-98 — decode
base64+JSON Kinesis records (S9), skip poison pills (P10/ST4), dedupe
within the batch (A2), idempotently put canonical title records and the
source×genre inverted-index rows (J2) into the single table.

Here: a file-source stream over the producer's JSON directory →
``decode_envelope`` (PERMISSIVE parse; malformed rows become NULL and
are filtered, never failing the batch) → ``foreachBatch`` MERGE into the
titles KeyedTable + index derivation. Exactly-once = checkpointed source
offsets + idempotent keyed MERGE (ST3).

Scale: the wire schema is explicit (no inference); per-batch dedup keys
on title id; the index derivation is two explodes — map-side until the
MERGE's key join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.titles import index_from_arrays
from ..schemas import TITLE_RECORD_SCHEMA
from ..sources.events import decode_envelope
from .storage import KeyedTable

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), True),
        T.StructField("data", T.StringType(), True),
    ]
)


def titles_table(spark: SparkSession, path: str) -> KeyedTable:
    return KeyedTable(spark, path, ["title_id"], TITLE_RECORD_SCHEMA)


def index_table(spark: SparkSession, path: str) -> KeyedTable:
    schema = T.StructType(
        [
            T.StructField("source_id", T.StringType(), False),
            T.StructField("genre_id", T.StringType(), False),
            T.StructField("title_id", T.LongType(), False),
        ]
    )
    # journal=False: no CDC consumer tails the index (only `titles`
    # feeds the enrichment cascade) and the journal's full-image
    # parquet append was ~half the index MERGE wall at a 50 M-row
    # batch (SCALE.md §6e profile; VERDICT r7 #5)
    return KeyedTable(
        spark, path, ["source_id", "genre_id", "title_id"], schema, journal=False
    )


def _to_title_records(decoded: DataFrame) -> DataFrame:
    """Payload → canonical record shape; enrichment fields start NULL
    (they arrive via the enrichment stream, S7)."""
    return decoded.select(
        F.col("id").alias("title_id"),
        "title",
        "year",
        "imdb_id",
        "tmdb_id",
        "tmdb_type",
        "type",
        "source_ids",
        "genre_ids",
        F.lit(None).cast("string").alias("plot_overview"),
        F.lit(None).cast("string").alias("poster"),
        F.lit(None).cast("double").alias("user_rating"),
    )


def start_consumer(
    spark: SparkSession,
    events_dir: str,
    titles: KeyedTable,
    index: KeyedTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 32,
    stage_timings: dict | None = None,
):
    """Start the consumer with an availableNow trigger (drain everything
    pending, then stop — the test/batch form; drop the trigger for a
    continuous deployment). ``max_files_per_trigger`` bounds micro-batch
    size (the Kinesis shard-batch knob); the crash-restart fuzz sets it
    to 1 so every bus file is its own micro-batch boundary.

    ``stage_timings``: pass a dict to accumulate per-stage wall seconds
    across micro-batches (keys ``materialize_sec`` — decode+dedup into
    the cache via an explicit count that only runs when profiling —
    ``titles_merge_sec``, ``index_merge_sec``, ``n_batches``,
    ``rows``); used by tools/profile_consumer.py to attribute the
    cascade's consumer leg."""
    import time  # noqa: PLC0415

    wire = (
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(events_dir)
    )
    decoded = decode_envelope(wire)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates(["id"]).cache()  # A2, reused twice below
        try:
            t0 = time.perf_counter()
            if stage_timings is not None:
                # profiling only: materialize decode+dedup into the cache
                # so the MERGE timings below don't absorb the scan
                n_rows = batch.count()
            t1 = time.perf_counter()
            records = _to_title_records(batch)
            titles.upsert(records)
            t2 = time.perf_counter()
            # J2 — the index rows are deliberately insert-only/immutable
            # (reference consumer.py:70-71); upsert of identical keys is a
            # no-op MODIFY, preserving that semantics idempotently.
            idx = index_from_arrays(
                batch.select(F.col("id").alias("title_id"), "source_ids", "genre_ids")
            )
            # when profiling, also split the index MERGE into its phases
            # (probe/touched/publish — see KeyedTable.upsert timings)
            index.upsert(idx, timings=stage_timings)
            if stage_timings is not None:
                t3 = time.perf_counter()
                s = stage_timings
                s["materialize_sec"] = s.get("materialize_sec", 0.0) + (t1 - t0)
                s["titles_merge_sec"] = s.get("titles_merge_sec", 0.0) + (t2 - t1)
                s["index_merge_sec"] = s.get("index_merge_sec", 0.0) + (t3 - t2)
                s["n_batches"] = s.get("n_batches", 0) + 1
                s["rows"] = s.get("rows", 0) + n_rows
        finally:
            batch.unpersist()

    return (
        decoded.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
