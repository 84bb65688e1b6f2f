"""Typed schemas for every entity in the reference's single-table design.

The reference encodes entity type in a DynamoDB key prefix
(``cloudformation/uktv-event-streaming-app.yaml:40-56`` in the reference
repo); here each logical entity gets a typed StructType (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Title payload — the WatchMode list-titles record plus ingestion-appended
# arrays (reference: events/title_recommendation_kinesis_event.json:8,
# src/userprefs_title_ingestion/ingestion.py:153-155).
TITLE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("imdb_id", T.StringType(), True),
        T.StructField("tmdb_id", T.LongType(), True),
        T.StructField("tmdb_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("source_ids", T.ArrayType(T.StringType()), True),
        T.StructField("genre_ids", T.ArrayType(T.StringType()), True),
    ]
)

# Event envelope — reference: src/userprefs_title_ingestion/ingestion.py:157-164.
ENVELOPE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("publishingComponent", T.StringType(), False),
        T.StructField("publishTimestamp", T.TimestampType(), False),
        T.StructField("publishCause", T.StringType(), False),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("header", ENVELOPE_HEADER_SCHEMA, False),
        T.StructField("payload", TITLE_PAYLOAD_SCHEMA, True),
    ]
)

# Canonical stored title record, post-enrichment fields included
# (reference: src/title_enrichment/enrichment.py:114-125).
TITLE_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("title_id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("imdb_id", T.StringType(), True),
        T.StructField("tmdb_id", T.LongType(), True),
        T.StructField("tmdb_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("source_ids", T.ArrayType(T.StringType()), True),
        T.StructField("genre_ids", T.ArrayType(T.StringType()), True),
        T.StructField("plot_overview", T.StringType(), True),
        T.StructField("poster", T.StringType(), True),
        T.StructField("user_rating", T.DoubleType(), True),
    ]
)

# Reference data dims (reference: src/periodic_reference_data/reference.py:138-158).
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

GENRE_SCHEMA = T.StructType(
    [
        T.StructField("genre_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

# One row per user selection (reference: src/user_preferences/preferences.py:153-161).
USER_PREF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # 'source' | 'genre'
        T.StructField("pref_id", T.StringType(), False),
    ]
)

# Inverted index row (reference: src/title_recommendations_consumer/consumer.py:79-89).
TITLE_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("genre_id", T.StringType(), False),
        T.StructField("title_id", T.LongType(), False),
    ]
)

# Enrichment details lookup (mocks WatchMode /v1/title/{id}/details/;
# reference: src/title_enrichment/enrichment.py:69-79).
DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("title_id", T.LongType(), False),
        T.StructField("plot_overview", T.StringType(), True),
        T.StructField("poster", T.StringType(), True),
        T.StructField("user_rating", T.DoubleType(), True),
    ]
)

# CDC change row (reference DynamoDB Stream NEW_IMAGE shape;
# events/title_enrichment_event.json:1-50).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("event_name", T.StringType(), False),  # INSERT/MODIFY/REMOVE
        T.StructField("entity", T.StringType(), False),  # 'title' | 'index' | ...
        T.StructField("sequence_number", T.LongType(), False),
        T.StructField("new_image", TITLE_RECORD_SCHEMA, True),
    ]
)
