"""Streaming exact dedup — cross-micro-batch, bounded state.

The batch dedup tiers live in ``operators/dedup.py``; this is the
streaming form a training-data ingestion pipeline needs: drop records
whose key was already seen, across micro-batches, with state that
EXPIRES — ``dropDuplicatesWithinWatermark`` keeps a key in the state
store only until the watermark passes it, so state is bounded by
(watermark horizon × arrival rate) instead of growing with the full
history (plain ``dropDuplicates`` on a stream never forgets: a 100 TB
ingest would accumulate every key ever seen).

The reference's equivalent is the idempotent keyed put (consumer.py:58 —
last write wins, so duplicates are harmless but still cost a write);
this operator removes them before the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def dedup_stream(
    records: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon.

    Works on a stream (stateful, state expires with the watermark) and
    degrades to a plain dropDuplicates on a batch frame."""
    if not records.isStreaming:
        return records.dropDuplicates(key_cols)
    return records.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def start_dedup_stream(
    records: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Deduped append-mode parquet sink (availableNow for the batch/test
    form; drop the trigger for continuous ingestion)."""
    out = dedup_stream(records, key_cols, ts_col, watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
