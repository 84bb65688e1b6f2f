"""tv_event_streaming_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference TV-guide
event-streaming application (``edoatley/tv-event-streaming``).

The reference is a serverless AWS pipeline (Lambda + Kinesis + DynamoDB
single-table design).  This package re-expresses every query and stream
operator the reference implements as idiomatic Spark DataFrame / SQL /
Structured Streaming plans (see SURVEY.md for the operator-by-operator
mapping), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) a 100 TB
deployment needs.

Layout
------
- ``session``     SparkSession factory (AQE, UTC, Arrow).
- ``schemas``     StructTypes for the title payload, event envelope, dims.
- ``domain``      deterministic TV-domain derivation from the synthetic
                  TPC-H-ish test tables (sources/genres/titles/user_prefs/
                  title_index) — arithmetic-only so a SQL oracle can
                  reproduce it exactly.
- ``sources``     batch/stream readers and the event-envelope codec.
- ``operators``   relational operators: preference queries and delta
                  merges, the flagship titles semi-join, admin analytics,
                  dedup / similarity / text-analysis / multimodal ops.
- ``plans``       the query catalog: every operator as a (spark_fn,
                  oracle_sql) pair over the test tables.
- ``streaming``   Structured Streaming pipelines: producer, consumer,
                  enrichment CDC, and the upsert storage layer.
"""

__version__ = "0.1.0"
