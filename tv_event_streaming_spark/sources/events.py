"""Event-envelope codec — the Kinesis wire format as Spark expressions.

Reference: the producer wraps every title in
``{header: {publishingComponent, publishTimestamp, publishCause},
payload: <title>}`` (ingestion.py:157-164), JSON on the wire, base64 at
the consumer boundary (consumer.py:39-41), partition key = title id
(ingestion.py:165-167). The consumer decodes, validates, and skips
poison pills without failing the batch (consumer.py:44-53).

All JVM-side expressions (to_json/from_json/base64/unbase64) — no Python
in the hot path, whole-stage-codegen friendly at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ENVELOPE_SCHEMA, TITLE_PAYLOAD_SCHEMA

PRODUCER_COMPONENT = "UserPrefsTitleIngestionFunction"
PRODUCER_CAUSE = "scheduled_user_prefs_ingestion"

PAYLOAD_COLS = [f.name for f in TITLE_PAYLOAD_SCHEMA.fields]


def envelope_struct(
    payload: Column,
    publish_ts: Column,
    component: str = PRODUCER_COMPONENT,
    cause: str = PRODUCER_CAUSE,
) -> Column:
    """S8 — the envelope struct (ingestion.py:157-164)."""
    header = F.struct(
        F.lit(component).alias("publishingComponent"),
        publish_ts.alias("publishTimestamp"),
        F.lit(cause).alias("publishCause"),
    )
    return F.struct(header.alias("header"), payload.alias("payload"))


def encode_envelope(df: DataFrame, payload_cols: list[str], ts_col: str) -> DataFrame:
    """Producer wire format: JSON-serialized envelope, base64-encoded,
    partition key = title id as string (ingestion.py:165-167)."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    env = envelope_struct(payload, F.col(ts_col))
    return df.select(
        F.col(payload_cols[0]).cast("string").alias("partition_key"),
        F.base64(F.to_json(env).cast("binary")).alias("data"),
    )


def decode_envelope(df: DataFrame, data_col: str = "data") -> DataFrame:
    """S9/P10 — consumer decode: base64 → JSON → typed columns, then the
    validity filter (drop records missing payload or payload.id —
    consumer.py:44-48). ``from_json`` is PERMISSIVE: malformed JSON
    becomes NULL and is dropped by the same filter (poison-pill
    semantics, consumer.py:50-53)."""
    parsed = df.withColumn(
        "envelope",
        F.from_json(F.unbase64(F.col(data_col)).cast("string"), ENVELOPE_SCHEMA),
    )
    return parsed.filter(
        F.col("envelope.payload").isNotNull() & F.col("envelope.payload.id").isNotNull()
    ).select(
        F.col("envelope.header.publishingComponent").alias("publishing_component"),
        F.col("envelope.header.publishTimestamp").alias("publish_timestamp"),
        F.col("envelope.header.publishCause").alias("publish_cause"),
        F.col("envelope.payload.*"),
    )
