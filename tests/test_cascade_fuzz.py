"""Model-based fuzzing of the flagship streaming cascade (SURVEY §3.2).

Random preference tables and title lookups — unicode/quote/newline-laden
titles and pref ids, NULL titles/years, more titles than the fetch
limit, details missing for a random subset of ids, NULL detail fields,
empty prefs, empty lookups — run through the REAL pipeline: producer
envelope (JSON+base64) → file bus with poison pills → consumer stream
(PERMISSIVE decode, MERGE canonical + index) → at-least-once REDELIVERY
(fresh checkpoint, same events) → enrichment CDC (INSERT-only filter,
update_fields). The final tables must equal a plain Python model of the
reference semantics:

- canonical: the first ``fetch_limit`` titles by id, each carrying the
  global sorted-distinct source/genre arrays, enriched iff a details
  row exists (N/A / 0.0 coalesce for NULL detail fields);
- index: exactly ids × sources × genres;
- the poison pills and the redelivery leave no trace (skip + idempotent
  MODIFY) — and the enrichment runs AFTER redelivery, so its CDC filter
  must ignore the redelivery's MODIFY events (the loop-breaker P3).

Every example starts two consumer streams and one enrichment stream, so
this tier runs at a reduced example count.
"""

from __future__ import annotations

import base64
import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tv_event_streaming_spark.schemas import USER_PREF_SCHEMA
from tv_event_streaming_spark.streaming.consumer import (
    index_table,
    start_consumer,
    titles_table,
)
from tv_event_streaming_spark.streaming.enrichment import start_enrichment
from tv_event_streaming_spark.streaming.producer import build_title_events, publish

_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "4"))

FETCH_LIMIT = 5

_title_text = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "Grüße aus München — 北京 🚀",
            'quote " and \\ backslash',
            "new\nline and\ttab",
            "plain title",
            "ünïcödé",
        ]
    ),
)
_pref_id = st.sampled_from(["s1", "s2", "gé-北", 'q"uote', "x", ""])

_titles = st.lists(
    st.tuples(
        st.integers(0, 30),
        _title_text,
        st.one_of(st.none(), st.integers(1950, 2030)),
        st.sampled_from(["movie", "tv"]),
    ),
    unique_by=lambda t: t[0],
    min_size=0,
    max_size=8,
)
_prefs = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.sampled_from(["source", "genre"]),
        _pref_id,
    ),
    min_size=0,
    max_size=8,
)

LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("imdb_id", T.StringType(), True),
        T.StructField("tmdb_id", T.LongType(), True),
        T.StructField("tmdb_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)
DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("title_id", T.LongType(), False),
        T.StructField("plot_overview", T.StringType(), True),
        T.StructField("poster", T.StringType(), True),
        T.StructField("user_rating", T.DoubleType(), True),
    ]
)


def _stage_inputs(spark, root, titles, prefs, details_mod, null_details, n_files=None):
    """Stage 1 shared by the fuzz tiers: build the lookup/prefs/details
    frames and publish the bus (with the three poison pills). Returns
    ``(events_dir, details)``. ``n_files`` coalesces the event frame so
    the bus has a known small file count (the crash-restart tier reads
    it at maxFilesPerTrigger=1, making each file a micro-batch)."""
    lookup_rows = [
        (tid, title, year, f"tt{tid}", tid * 2, "tv", typ)
        for tid, title, year, typ in titles
    ]
    lookup = spark.createDataFrame(lookup_rows, LOOKUP_SCHEMA)
    pref_rows = [(f"u{u}", kind, pid) for u, kind, pid in prefs]
    user_prefs = spark.createDataFrame(pref_rows, USER_PREF_SCHEMA)
    # details exist for ids % details_mod == 0 (the fetch-failure path
    # for the rest); NULL fields exercise the N/A / 0.0 coalesce
    det_rows = [
        (
            tid,
            None if null_details else f"plot-{tid}-北",
            None if null_details else f"poster-{tid}",
            None if null_details else float(tid) / 2.0,
        )
        for tid, *_ in titles
        if tid % details_mod == 0
    ]
    details = spark.createDataFrame(det_rows, DETAILS_SCHEMA)

    events_dir = str(root / "events")
    events = build_title_events(user_prefs, lookup, fetch_limit=FETCH_LIMIT)
    if n_files is not None:
        events = events.coalesce(n_files)
    publish(events, events_dir)
    os.makedirs(events_dir, exist_ok=True)
    with open(os.path.join(events_dir, "poison.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"partition_key": "x", "data": base64.b64encode(b"notjson").decode()}
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "partition_key": "y",
                    "data": base64.b64encode(
                        json.dumps({"header": {}, "payload": {}}).encode()
                    ).decode(),
                }
            )
            + "\n"
        )
        fh.write("this is not even json\n")
    return events_dir, details


def _assert_final_state(
    titles_kt, index_kt, titles, prefs, details_mod, null_details
):
    """The plain-Python model of the reference semantics, asserted
    against the final canonical + index tables."""
    src = sorted({pid for _, kind, pid in prefs if kind == "source"})
    gen = sorted({pid for _, kind, pid in prefs if kind == "genre"})
    kept = sorted(t[0] for t in titles)[:FETCH_LIMIT]
    by_id = {t[0]: t for t in titles}
    exp_titles = {}
    for tid in kept:
        _, title, year, typ = by_id[tid]
        if tid % details_mod == 0:
            enr = (
                "N/A" if null_details else f"plot-{tid}-北",
                "N/A" if null_details else f"poster-{tid}",
                0.0 if null_details else float(tid) / 2.0,
            )
        else:
            enr = (None, None, None)
        exp_titles[tid] = (
            title, year, f"tt{tid}", tid * 2, "tv", typ, src, gen, *enr
        )

    got_titles = {
        r.title_id: (
            r.title, r.year, r.imdb_id, r.tmdb_id, r.tmdb_type, r.type,
            list(r.source_ids) if r.source_ids is not None else None,
            list(r.genre_ids) if r.genre_ids is not None else None,
            r.plot_overview, r.poster, r.user_rating,
        )
        for r in titles_kt.read().collect()
    }
    assert got_titles == exp_titles, (got_titles, exp_titles)

    exp_index = {(s, g, tid) for tid in kept for s in src for g in gen}
    got_index = {
        (r.source_id, r.genre_id, r.title_id) for r in index_kt.read().collect()
    }
    assert got_index == exp_index, (got_index, exp_index)


@settings(
    max_examples=max(2, _EXAMPLES // 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    titles=_titles,
    prefs=_prefs,
    details_mod=st.integers(1, 4),
    null_details=st.booleans(),
)
def test_cascade_matches_model_on_random_domain(
    spark, tmp_path_factory, titles, prefs, details_mod, null_details
):
    root = tmp_path_factory.mktemp("cascfuzz")
    events_dir, details = _stage_inputs(
        spark, root, titles, prefs, details_mod, null_details
    )
    titles_kt = titles_table(spark, str(root / "titles"))
    index_kt = index_table(spark, str(root / "index"))

    # stage 2 — consume, then REDELIVER everything (fresh checkpoint)
    q = start_consumer(spark, events_dir, titles_kt, index_kt, str(root / "ck1"))
    assert q.awaitTermination(120)
    q = start_consumer(spark, events_dir, titles_kt, index_kt, str(root / "ck2"))
    assert q.awaitTermination(120)

    # stage 3 — enrichment CDC over the full journal (INSERTs from the
    # first delivery, MODIFYs from the redelivery — must be filtered)
    q = start_enrichment(spark, titles_kt, details, str(root / "ck3"))
    assert q.awaitTermination(120)

    _assert_final_state(
        titles_kt, index_kt, titles, prefs, details_mod, null_details
    )


def _drain_tolerating_injected_crash(q):
    """Await a stream that MAY die from an injected fault: a surfaced
    exception is the expected crash (budget below the run's upsert
    count); clean termination means the budget exceeded the run's work
    (also fine — hypothesis shrinks toward crashing budgets). A hang is
    neither and fails."""
    try:
        done = q.awaitTermination(180)
    except Exception:
        return  # the injected crash surfaced through the query thread
    assert done, "stream neither finished nor crashed within 180s"


@settings(
    max_examples=max(2, _EXAMPLES // 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    titles=_titles,
    prefs=_prefs,
    details_mod=st.integers(1, 4),
    consumer_crashes=st.lists(st.integers(0, 5), min_size=1, max_size=2),
    enrich_crash=st.one_of(st.none(), st.integers(0, 1)),
)
def test_cascade_survives_crash_restart_at_random_points(
    spark, tmp_path_factory, titles, prefs, details_mod,
    consumer_crashes, enrich_crash,
):
    """Fault injection (r6 verdict #6): kill the cascade's streams at
    RANDOM points — after the k-th table write, which lands crashes
    mid-micro-batch (between the titles MERGE and the index MERGE) as
    well as at micro-batch boundaries (maxFilesPerTrigger=1 makes every
    bus file its own batch) — then restart from the SAME checkpoint.
    foreachBatch output is not transactional with the offset commit, so
    the crashed batch is REPLAYED on restart, possibly after partial
    application; the idempotent keyed MERGE must absorb it. After every
    injected crash schedule, the final tables must equal the model
    exactly — crash-restart is example-tested (test_storage.py); this
    fuzzes arbitrary crash schedules against the full cascade."""
    from tv_event_streaming_spark.streaming.storage import KeyedTable

    root = tmp_path_factory.mktemp("cascrash")
    events_dir, details = _stage_inputs(
        spark, root, titles, prefs, details_mod, False, n_files=3
    )
    titles_kt = titles_table(spark, str(root / "titles"))
    index_kt = index_table(spark, str(root / "index"))

    real_upsert = KeyedTable.upsert
    for budget in consumer_crashes:
        calls = {"n": 0}

        def crashing(self, batch, _b=budget, _c=calls):
            if _c["n"] >= _b:
                raise RuntimeError("injected crash")
            _c["n"] += 1
            return real_upsert(self, batch)

        KeyedTable.upsert = crashing
        try:
            q = start_consumer(
                spark, events_dir, titles_kt, index_kt, str(root / "ck1"),
                max_files_per_trigger=1,
            )
            _drain_tolerating_injected_crash(q)
        finally:
            KeyedTable.upsert = real_upsert
    # recovery run from the same checkpoint, then an at-least-once
    # REDELIVERY of the whole bus (fresh checkpoint)
    q = start_consumer(
        spark, events_dir, titles_kt, index_kt, str(root / "ck1"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(180)
    q = start_consumer(spark, events_dir, titles_kt, index_kt, str(root / "ck2"))
    assert q.awaitTermination(120)

    if enrich_crash is not None:
        real_uf = KeyedTable.update_fields
        calls = {"n": 0}

        def crashing_uf(self, updates, fields, _c=calls):
            if _c["n"] >= enrich_crash:
                raise RuntimeError("injected crash")
            _c["n"] += 1
            return real_uf(self, updates, fields)

        KeyedTable.update_fields = crashing_uf
        try:
            q = start_enrichment(spark, titles_kt, details, str(root / "ck3"))
            _drain_tolerating_injected_crash(q)
        finally:
            KeyedTable.update_fields = real_uf
    q = start_enrichment(spark, titles_kt, details, str(root / "ck3"))
    assert q.awaitTermination(180)

    _assert_final_state(titles_kt, index_kt, titles, prefs, details_mod, False)
