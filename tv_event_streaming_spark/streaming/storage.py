"""Versioned keyed parquet tables: MERGE upserts + a CDC change journal.

Spark has no in-place update without a table format (SURVEY.md §7
phase 2). This layer gives the reference's DynamoDB semantics —
idempotent keyed puts (consumer.py:58-89), nested-field updates
(enrichment.py:114-125), and a NEW_IMAGE change stream
(uktv-event-streaming-app.yaml:55-56) — on plain parquet:

- each MERGE writes a NEW immutable version directory ``v=N`` and then
  flips the ``_CURRENT`` pointer (atomic rename), so readers never see a
  half-written table;
- every MERGE appends INSERT/MODIFY rows (full new image + version) to
  ``_changes/``, which Structured Streaming can tail as a file source —
  the Delta CDF stand-in.

On a real deployment this class is replaced wholesale by Delta/Iceberg
``MERGE INTO`` + change data feed; the pipeline code above it doesn't
change. Scale note: rewrite cost is O(table) per batch here; a format
with file-level pruning makes it O(touched partitions) — the pipeline
semantics (idempotent key MERGE) are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class KeyedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        schema: T.StructType,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    @property
    def changes_dir(self) -> str:
        return os.path.join(self.path, "_changes")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(self._version_dir(v))

    def read_changes(self) -> DataFrame:
        if not os.path.isdir(self.changes_dir) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.changes_dir) for f in fs
        ):
            return self.spark.createDataFrame([], self._changes_schema())
        return self.spark.read.schema(self._changes_schema()).parquet(self.changes_dir)

    def stream_changes(self) -> DataFrame:
        """The CDC source (S10): tail the change journal as a stream."""
        return (
            self.spark.readStream.schema(self._changes_schema())
            .option("maxFilesPerTrigger", 16)
            .parquet(self.changes_dir)
        )

    def _changes_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("event_name", T.StringType(), False),
                T.StructField("version", T.LongType(), False),
                *self.schema.fields,
            ]
        )

    # -- merge --------------------------------------------------------------

    def upsert(self, batch: DataFrame) -> dict[str, int]:
        """MERGE: insert new keys, overwrite existing ones (the
        reference's idempotent put). Appends the change journal.

        The batch is deduplicated on the key first (last-writer-wins is
        unnecessary — reference batches carry identical payloads per key,
        consumer.py:57).
        """
        batch = batch.dropDuplicates(self.key_cols)
        if batch.isEmpty():  # empty micro-batches must not write versions
            return {"version": self.current_version(), "inserts": 0, "modifies": 0}
        current = self.read()
        # journal classification: new key -> INSERT, existing -> MODIFY
        inserts = batch.join(current, self.key_cols, "left_anti")
        modifies = batch.join(
            current.select(*self.key_cols), self.key_cols, "left_semi"
        )
        untouched = current.join(batch, self.key_cols, "left_anti")
        new_state = untouched.unionByName(batch)

        v = self.current_version() + 1
        new_state.write.mode("overwrite").parquet(self._version_dir(v))
        changes = inserts.select(F.lit("INSERT").alias("event_name"), F.lit(v).cast("long").alias("version"), "*").unionByName(
            modifies.select(F.lit("MODIFY").alias("event_name"), F.lit(v).cast("long").alias("version"), "*")
        )
        changes.write.mode("append").parquet(self.changes_dir)
        self._flip(v)
        n_ins = inserts.count()
        n_mod = modifies.count()
        return {"version": v, "inserts": n_ins, "modifies": n_mod}

    def update_fields(self, updates: DataFrame, fields: list[str]) -> dict[str, int]:
        """Field-level MERGE (the reference's UpdateItem on nested paths,
        enrichment.py:114-125): for keys present in ``updates``, set only
        ``fields``; all other columns and rows unchanged. Rows in
        ``updates`` whose key doesn't exist are ignored (fetch-then-update
        semantics)."""
        upd = updates.dropDuplicates(self.key_cols).alias("u")
        if upd.isEmpty():
            return {"version": self.current_version(), "modifies": 0}
        current = self.read()
        cur = current.alias("c")
        merged = cur.join(upd, self.key_cols, "left_outer").select(
            *[F.col(f"c.{k}").alias(k) for k in self.key_cols],
            *[
                (
                    F.when(F.col(f"u.{self.key_cols[0]}").isNotNull(), F.col(f"u.{f}"))
                    .otherwise(F.col(f"c.{f}"))
                    .alias(f)
                    if f in fields
                    else F.col(f"c.{f}").alias(f)
                )
                for f in current.columns
                if f not in self.key_cols
            ],
        )
        touched = upd.join(cur, self.key_cols, "left_semi")
        v = self.current_version() + 1
        merged.write.mode("overwrite").parquet(self._version_dir(v))
        new_images = merged.join(touched.select(*self.key_cols), self.key_cols, "left_semi")
        new_images.select(
            F.lit("MODIFY").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
        ).write.mode("append").parquet(self.changes_dir)
        self._flip(v)
        return {"version": v, "modifies": new_images.count()}

    def delete(self, keys: DataFrame) -> dict[str, int]:
        """Keyed delete (the preference-removal path, preferences.py:153-161)."""
        if keys.isEmpty():
            return {"version": self.current_version(), "deletes": 0}
        current = self.read()
        removed = current.join(keys, self.key_cols, "left_semi")
        remaining = current.join(keys, self.key_cols, "left_anti")
        v = self.current_version() + 1
        remaining.write.mode("overwrite").parquet(self._version_dir(v))
        removed.select(
            F.lit("REMOVE").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
        ).write.mode("append").parquet(self.changes_dir)
        self._flip(v)
        return {"version": v, "deletes": removed.count()}

    def _flip(self, v: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._pointer)
