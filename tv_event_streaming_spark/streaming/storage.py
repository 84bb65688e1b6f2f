"""Versioned keyed parquet tables: MERGE upserts + a CDC change journal.

Spark has no in-place update without a table format (SURVEY.md §7
phase 2). This layer gives the reference's DynamoDB semantics —
idempotent keyed puts (consumer.py:58-89), nested-field updates
(enrichment.py:114-125), and a NEW_IMAGE change stream
(uktv-event-streaming-app.yaml:55-56) — on plain parquet:

- the key space is hash-partitioned into ``n_buckets`` stable buckets
  (``pmod(xxhash64(keys), n)``); a MERGE rewrites ONLY the buckets its
  batch touches — O(batch ∪ touched buckets), never O(table);
- each MERGE writes new immutable bucket directories under
  ``data/v=N/`` and publishes a version MANIFEST mapping every bucket to
  the version directory that last wrote it, then flips the ``_CURRENT``
  pointer (atomic rename) — readers always see a consistent snapshot
  stitched from per-bucket paths;
- every MERGE appends INSERT/MODIFY/REMOVE rows (full new image +
  version) to ``_changes/``, which Structured Streaming can tail as a
  file source — the Delta CDF stand-in;
- merge counts come from ``DataFrame.observe`` metrics collected during
  the journal write itself — no extra count jobs per merge.

On a real deployment this class is replaced wholesale by Delta/Iceberg
``MERGE INTO`` + change data feed; the pipeline code above it doesn't
change. The bucket layout is exactly the rewrite-granularity story those
formats implement with file-level pruning; at 100 TB you'd raise
``n_buckets`` so a micro-batch touches a small fraction of files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "bucket__"


class KeyedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        schema: T.StructType,
        n_buckets: int = 16,
        journal: bool = True,
    ) -> None:
        """``journal=False`` turns off the NEW_IMAGE change journal for
        tables no CDC consumer tails (VERDICT r7 #5: the consumer's
        INDEX table has no stream_changes reader — only ``titles``
        feeds the enrichment cascade — and at a 50 M-row merge the
        journal's full-image parquet append was ~half the remaining
        merge wall). Merge counts then ride the DATA write via a
        marker-column Observation instead of the journal write, so the
        return contract is unchanged; :meth:`stream_changes` /
        :meth:`read_changes` raise, keeping a silent no-op journal from
        masquerading as an empty-but-live one."""
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.schema = schema
        self.n_buckets = n_buckets
        self.journal = journal
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

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.path, "_manifests", f"v={v}.json")

    def _read_manifest(self, v: int) -> dict[int, str]:
        """bucket id -> data directory (relative to table root)."""
        if v < 0:
            return {}
        with open(self._manifest_path(v)) as fh:
            return {int(k): p for k, p in json.load(fh).items()}

    def _write_manifest(self, v: int, manifest: dict[int, str]) -> None:
        os.makedirs(os.path.dirname(self._manifest_path(v)), exist_ok=True)
        tmp = self._manifest_path(v) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(k): p for k, p in manifest.items()}, fh)
        os.replace(tmp, self._manifest_path(v))

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets)).cast("int")

    # -- read ---------------------------------------------------------------

    def _read_buckets(self, manifest: dict[int, str], buckets: list[int] | None = None) -> DataFrame:
        dirs = [
            os.path.join(self.path, p)
            for b, p in sorted(manifest.items())
            if buckets is None or b in buckets
        ]
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*dirs)

    def read(self) -> DataFrame:
        return self._read_buckets(self._read_manifest(self.current_version()))

    def read_changes(self) -> DataFrame:
        if not self.journal:
            raise ValueError(
                "table was created with journal=False — no change journal"
            )
        if not os.path.isdir(self.changes_dir) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.changes_dir) for f in fs
        ):
            return self.spark.createDataFrame([], self._changes_schema())
        return self.spark.read.schema(self._changes_schema()).parquet(self.changes_dir)

    def stream_changes(self) -> DataFrame:
        """The CDC source (S10): tail the change journal as a stream.

        The journal directory is created if absent so a CDC consumer can
        start BEFORE the first write lands (fuzz-found: a file-source
        stream over a missing path raises PATH_NOT_FOUND at plan time,
        crashing an enrichment service deployed ahead of its producer)."""
        if not self.journal:
            raise ValueError(
                "table was created with journal=False — no change stream"
            )
        os.makedirs(self.changes_dir, exist_ok=True)
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

    def _touched_buckets(self, batch: DataFrame) -> list[int]:
        """Distinct bucket ids of a batch — bounded by ``n_buckets``
        (this is the one driver-side collect in the merge path; it
        returns at most n_buckets ints)."""
        rows = batch.select(self._bucket().alias("b")).distinct().collect()
        return sorted(r.b for r in rows)

    def _publish(
        self,
        v: int,
        new_state: DataFrame,
        touched: list[int],
        changes: DataFrame | None,
        obs: Observation,
        keys: tuple[str, ...] = ("inserts", "modifies", "deletes"),
    ) -> dict[str, int]:
        """Write touched buckets + journal, update the manifest, flip the
        pointer, and return the observed merge counts. ``changes=None``
        (a ``journal=False`` table) skips the journal append — the
        caller attached ``obs`` to the ``new_state`` lineage instead,
        so the counts ride the data write."""
        data_dir = os.path.join(self.path, "data", f"v={v}")
        new_state.withColumn(BUCKET_COL, self._bucket()).write.partitionBy(
            BUCKET_COL
        ).mode("overwrite").parquet(data_dir)
        if changes is not None:
            changes.write.mode("append").parquet(self.changes_dir)

        manifest = self._read_manifest(v - 1)
        for b in touched:
            bdir = os.path.join(data_dir, f"{BUCKET_COL}={b}")
            if os.path.isdir(bdir):
                manifest[b] = os.path.relpath(bdir, self.path)
            else:
                manifest.pop(b, None)  # bucket emptied (all rows deleted)
        self._write_manifest(v, manifest)
        self._flip(v)
        # Observation sums are NULL (None) when the change journal is
        # empty — e.g. delete() of keys absent from the table, or
        # update_fields() where no update key exists (the reference's
        # preference-removal path tolerates removing a non-existent key).
        got = obs.get
        return {"version": v, **{k: int(got[k] or 0) for k in keys if k in got}}

    @staticmethod
    def _observed(changes: DataFrame, obs: Observation) -> DataFrame:
        return changes.observe(
            obs,
            F.sum(F.when(F.col("event_name") == "INSERT", 1).otherwise(0)).alias("inserts"),
            F.sum(F.when(F.col("event_name") == "MODIFY", 1).otherwise(0)).alias("modifies"),
            F.sum(F.when(F.col("event_name") == "REMOVE", 1).otherwise(0)).alias("deletes"),
        )

    def upsert(
        self, batch: DataFrame, timings: dict | None = None
    ) -> dict[str, int]:
        """MERGE: insert new keys, overwrite existing ones (the
        reference's idempotent put). Appends the change journal.

        The batch is deduplicated on the key first (last-writer-wins is
        unnecessary — reference batches carry identical payloads per key,
        consumer.py:57). Only the buckets containing batch keys are read
        and rewritten.

        The deduped batch is persisted for the MERGE's duration: four
        actions read it (emptiness probe, touched-bucket collect, the
        journal write, the data write), and without the barrier each
        re-ran the batch's upstream lineage — for the consumer's index
        leg that lineage is a double explode + key-dedup shuffle of the
        full exploded set, and re-running it dominated the cascade
        (measured 2.7×: 279 s → 104 s on the 50 M-row merge, SCALE.md
        §6e).

        ``timings``: pass a dict to accumulate per-phase wall seconds
        (profiling, tools/profile_consumer.py): ``probe_sec`` —
        persist + emptiness probe (the dedup shuffle's map side);
        ``touched_sec`` — dedup completion into the cache + the
        bucket-id collect; ``publish_sec`` — touched-bucket read,
        merge joins, data (+journal) write, manifest flip."""
        import time  # noqa: PLC0415

        t = time.perf_counter if timings is not None else None
        batch = batch.dropDuplicates(self.key_cols).persist()
        try:
            t0 = t() if t else 0.0
            if batch.isEmpty():  # empty micro-batches must not write versions
                return {"version": self.current_version(), "inserts": 0, "modifies": 0}
            t1 = t() if t else 0.0
            touched = self._touched_buckets(batch)
            if timings is not None:
                t2 = t()
                timings["probe_sec"] = timings.get("probe_sec", 0.0) + (t1 - t0)
                timings["touched_sec"] = timings.get("touched_sec", 0.0) + (
                    t2 - t1
                )
            current = self._read_buckets(
                self._read_manifest(self.current_version()), touched
            )
            untouched = current.join(batch, self.key_cols, "left_anti")
            v = self.current_version() + 1
            obs = Observation()
            if not self.journal:
                # counts ride the DATA write: one marker left-join vs
                # the touched buckets' keys classifies insert/modify
                # without materializing a change frame at all. The
                # observe node sits ABOVE the union: a CollectMetrics
                # inside a union child whose sibling is an empty
                # relation never delivers its metrics under foreachBatch
                # (measured: Observation.get blocks forever on the first
                # micro-batch, when `current` is the empty v=-1 frame).
                marked = batch.join(
                    current.select(*self.key_cols).withColumn(
                        "_existing__", F.lit(True)
                    ),
                    self.key_cols,
                    "left",
                )
                cols = [c for c in batch.columns]
                tagged = untouched.withColumn("_m__", F.lit(1)).unionByName(
                    marked.select(
                        *cols,
                        F.when(F.col("_existing__").isNotNull(), F.lit(2))
                        .otherwise(F.lit(3))
                        .alias("_m__"),
                    )
                )
                new_state = tagged.observe(
                    obs,
                    F.sum(F.when(F.col("_m__") == 3, 1).otherwise(0)).alias(
                        "inserts"
                    ),
                    F.sum(F.when(F.col("_m__") == 2, 1).otherwise(0)).alias(
                        "modifies"
                    ),
                ).drop("_m__")
                tp = t() if t else 0.0
                out = self._publish(v, new_state, touched, None, obs)
                if timings is not None:
                    timings["publish_sec"] = timings.get("publish_sec", 0.0) + (
                        t() - tp
                    )
                out.pop("deletes", None)
                return out
            new_state = untouched.unionByName(batch)
            # journal classification: new key -> INSERT, existing -> MODIFY
            inserts = batch.join(current, self.key_cols, "left_anti")
            modifies = batch.join(
                current.select(*self.key_cols), self.key_cols, "left_semi"
            )
            changes = inserts.select(
                F.lit("INSERT").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
            ).unionByName(
                modifies.select(
                    F.lit("MODIFY").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
                )
            )
            tp = t() if t else 0.0
            out = self._publish(v, new_state, touched, self._observed(changes, obs), obs)
            if timings is not None:
                timings["publish_sec"] = timings.get("publish_sec", 0.0) + (
                    t() - tp
                )
            out.pop("deletes", None)
            return out
        finally:
            batch.unpersist()

    def update_fields(self, updates: DataFrame, fields: list[str]) -> dict[str, int]:
        """Field-level MERGE (the reference's UpdateItem on nested paths,
        enrichment.py:114-125): for keys present in ``updates``, set only
        ``fields``; all other columns and rows unchanged. Rows in
        ``updates`` whose key doesn't exist are ignored (fetch-then-update
        semantics). Only touched buckets are rewritten.

        The deduped batch is persisted for the MERGE's duration, same as
        :meth:`upsert`: the enrichment leg's updates carry a
        stream-static join in their lineage, and the four actions here
        (emptiness probe, touched-bucket collect, data write, journal
        write) would each re-run it."""
        upd_base = updates.dropDuplicates(self.key_cols).persist()
        upd = upd_base.alias("u")
        try:
            if upd.isEmpty():
                return {"version": self.current_version(), "modifies": 0}
            touched = self._touched_buckets(upd)
            current = self._read_buckets(
                self._read_manifest(self.current_version()), touched
            )
            cur = current.alias("c")
            # one left-outer join + ONE field-merge projection list,
            # shared by both publish paths (ADVICE r8: the journaled and
            # no-journal branches carried byte-identical 25-line copies)
            joined = cur.join(upd, self.key_cols, "left_outer")
            hit = F.col(f"u.{self.key_cols[0]}").isNotNull()
            key_sel = [F.col(f"c.{k}").alias(k) for k in self.key_cols]
            merge_sel = [
                (
                    F.when(hit, F.col(f"u.{f}")).otherwise(F.col(f"c.{f}")).alias(f)
                    if f in fields
                    else F.col(f"c.{f}").alias(f)
                )
                for f in current.columns
                if f not in self.key_cols
            ]
            merged = joined.select(*key_sel, *merge_sel)
            v = self.current_version() + 1
            obs = Observation()
            if not self.journal:
                # modifies = |cur ∩ upd|, observed on the data write via
                # a marker column on the same left-outer join
                marked = joined.select(
                    *key_sel, *merge_sel, hit.alias("_upd__")
                ).observe(
                    obs,
                    F.sum(F.when(F.col("_upd__"), 1).otherwise(0)).alias(
                        "modifies"
                    ),
                )
                out = self._publish(
                    v, marked.drop("_upd__"), touched, None, obs
                )
                return {"version": out["version"], "modifies": out["modifies"]}
            touched_keys = upd.join(cur, self.key_cols, "left_semi")
            new_images = merged.join(
                touched_keys.select(*self.key_cols), self.key_cols, "left_semi"
            )
            changes = new_images.select(
                F.lit("MODIFY").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
            )
            out = self._publish(v, merged, touched, self._observed(changes, obs), obs)
            return {"version": out["version"], "modifies": out["modifies"]}
        finally:
            upd_base.unpersist()

    def delete(self, keys: DataFrame) -> dict[str, int]:
        """Keyed delete (the preference-removal path, preferences.py:153-161).
        Only touched buckets are rewritten; a bucket left empty drops out
        of the manifest. The key batch is persisted for the delete's
        duration (same multi-action lineage re-run as :meth:`upsert`)."""
        keys = keys.persist()
        try:
            if keys.isEmpty():
                return {"version": self.current_version(), "deletes": 0}
            touched = self._touched_buckets(keys)
            current = self._read_buckets(
                self._read_manifest(self.current_version()), touched
            )
            v = self.current_version() + 1
            obs = Observation()
            if not self.journal:
                # deletes = |cur ∩ keys|, observed upstream of the
                # surviving-row filter on one marker left-join
                marked = current.join(
                    # distinct(): a duplicated delete key must not fan
                    # out current rows through the left join (the
                    # journaled path's semi/anti joins are dupe-safe)
                    keys.select(*self.key_cols)
                    .distinct()
                    .withColumn("_del__", F.lit(True)),
                    self.key_cols,
                    "left",
                ).observe(
                    obs,
                    F.sum(
                        F.when(F.col("_del__").isNotNull(), 1).otherwise(0)
                    ).alias("deletes"),
                )
                remaining = marked.filter(F.col("_del__").isNull()).drop(
                    "_del__"
                )
                out = self._publish(v, remaining, touched, None, obs)
                return {"version": out["version"], "deletes": out["deletes"]}
            removed = current.join(keys, self.key_cols, "left_semi")
            remaining = current.join(keys, self.key_cols, "left_anti")
            changes = removed.select(
                F.lit("REMOVE").alias("event_name"), F.lit(v).cast("long").alias("version"), "*"
            )
            out = self._publish(v, remaining, touched, self._observed(changes, obs), obs)
            return {"version": out["version"], "deletes": out["deletes"]}
        finally:
            keys.unpersist()

    def _flip(self, v: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._pointer)
