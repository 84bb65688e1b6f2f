"""Differential fuzzing of the REAL Structured Streaming execution.

The events fuzz family checks the stateful operators' BATCH twins
against the DuckDB oracle; this file drives the actual streaming
queries — availableNow file streams split into three event-time-ordered
micro-batches, watermarks advancing between them, the state store
merging sessions/bursts across batch boundaries — over the same
adversarial random tables (threshold-exact gaps, same-instant
duplicates split ACROSS micro-batches, empty batches, empty streams),
and pins the repo's stream/batch agreement contracts on every example:

- windowed/sliding metrics: emissions are unique, every emitted row
  agrees with the batch twin, and every watermark-closed window was
  emitted (exactly-once materialization);
- session/burst operators: every closed session/burst the stream emits
  appears verbatim in the batch gaps-and-islands twin (stream ⊆ batch
  — the open tail legitimately stays in state);
- running totals: the final emitted state per user equals the batch
  aggregate exactly (count) / to float-sum tolerance (value).

Arrival order tracks event time (rows sorted by ts before chunking), as
the operators' documented contract requires — late-data DROP behavior
is covered by the watermark tests in test_streaming_metrics.py.

Each example starts five real streaming queries, so this tier runs at
a reduced example count like the composition tier.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from .test_differential_fuzz import _row

_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "4"))


def _write_stream_chunks(rows, tmpdir, sort_by_time=True) -> str:
    """The random events table as a 3-file stream source, split into
    thirds BY INDEX. With ``sort_by_time`` arrival order tracks event
    time — so a run of same-instant duplicates can straddle a
    micro-batch boundary, exactly the state-merge case worth fuzzing;
    without it, later micro-batches deliver events OLDER than the
    advanced watermark (the at-least-once bus reordering case)."""
    src = f"{tmpdir}/src"
    os.makedirs(src, exist_ok=True)
    ordered = (
        sorted(enumerate(rows), key=lambda ir: (ir[1][0], ir[0]))
        if sort_by_time
        else list(enumerate(rows))
    )
    k = len(ordered)
    chunks = [ordered[: k // 3], ordered[k // 3 : 2 * k // 3], ordered[2 * k // 3 :]]
    for ci, chunk in enumerate(chunks):
        table = pa.table(
            {
                "event_id": pa.array([i for i, _ in chunk], pa.int64()),
                "ts": pa.array([r[0] for _, r in chunk], pa.timestamp("us")),
                "user_id": pa.array([r[1] for _, r in chunk], pa.int64()),
                "event_type": pa.array([r[2] for _, r in chunk], pa.string()),
                "value": pa.array(
                    [None if r[3] is None else float(r[3]) for _, r in chunk],
                    pa.float64(),
                ),
                "props": pa.array([r[4] for _, r in chunk], pa.string()),
            }
        )
        pq.write_table(table, f"{src}/chunk_{ci}.parquet")
    return src


def _read_stream(spark, src_dir):
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _drain(stream_df, sink, ckpt, timeout=180):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout), "stream did not drain in time"


def _check_running_totals(spark, sink, batch_events):
    """The final emitted state per user must equal the batch aggregate:
    counts exactly, value sums to float-addition-order tolerance.
    Counts and sums are arrival-order-independent, so this holds for
    BOTH the event-time-ordered and the reordered arrival tests."""
    from pyspark.sql import Window

    log = spark.read.schema(
        "user_id bigint, n_events bigint, total_value double"
    ).parquet(sink)
    # n_events strictly increases per emission for a user, so the row
    # with the max count IS the final state (value may DECREASE when
    # negative values arrive — max(total_value) would be wrong here)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    batch_tot = batch_events.groupBy("user_id").agg(
        F.count("*").alias("bn"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("bv"),
    )
    joined = final.join(batch_tot, "user_id", "full_outer")
    bad = joined.filter(
        F.col("n_events").isNull()
        | F.col("bn").isNull()
        | (F.col("n_events") != F.col("bn"))
        | (F.abs(F.col("total_value") - F.col("bv")) > 1e-6)
    )
    assert bad.count() == 0, bad.limit(5).collect()


@settings(
    max_examples=max(2, _EXAMPLES // 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=0, max_size=50))
@example(rows=[])  # the empty stream must drain cleanly and emit nothing
def test_streaming_matches_batch_on_random_events(spark, tmp_path_factory, rows):
    from tv_event_streaming_spark.operators.analytics import sessionize
    from tv_event_streaming_spark.streaming.metrics import (
        error_bursts,
        error_bursts_batch,
        running_user_totals,
        session_metrics,
        sliding_metrics,
        windowed_metrics,
    )

    tmpdir = str(tmp_path_factory.mktemp("streamfuzz"))
    src = _write_stream_chunks(rows, tmpdir)
    batch_events = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).parquet(src)

    # explicit sink schemas: an all-empty stream writes no data files,
    # and schemaless parquet reads on such sinks cannot infer
    _WIN_SCHEMA = (
        "window_start timestamp, window_end timestamp, event_type string, "
        "invocations bigint, errors bigint, successes bigint"
    )

    # -- tumbling windows: unique, batch-consistent, closed ⇒ emitted --
    sink, ckpt = f"{tmpdir}/win_sink", f"{tmpdir}/win_ckpt"
    _drain(windowed_metrics(_read_stream(spark, src)), sink, ckpt)
    emitted = [tuple(r) for r in spark.read.schema(_WIN_SCHEMA).parquet(sink).collect()]
    batch_all = {tuple(r) for r in windowed_metrics(batch_events).collect()}
    assert len(emitted) == len(set(emitted)), "duplicate window emissions"
    assert set(emitted) <= batch_all, sorted(set(emitted) - batch_all)[:3]
    if rows:
        # derive the closed set from the already-collected batch rows:
        # window_end (tuple slot 1) at or before max event ts - 1h
        import datetime  # noqa: PLC0415

        max_ts = max(r[0] for r in rows)
        horizon = max_ts - datetime.timedelta(hours=1)
        closed = {t for t in batch_all if t[1] <= horizon}
        assert closed <= set(emitted), "watermark-closed windows missing"

    # -- sliding windows: emitted ⊆ batch --
    sink, ckpt = f"{tmpdir}/sli_sink", f"{tmpdir}/sli_ckpt"
    _drain(sliding_metrics(_read_stream(spark, src)), sink, ckpt)
    got = {tuple(r) for r in spark.read.schema(_WIN_SCHEMA).parquet(sink).collect()}
    batch = {tuple(r) for r in sliding_metrics(batch_events).collect()}
    assert got <= batch, sorted(got - batch)[:3]

    # -- session windows: closed sessions ⊆ batch sessionization --
    sink, ckpt = f"{tmpdir}/ses_sink", f"{tmpdir}/ses_ckpt"
    _drain(session_metrics(_read_stream(spark, src)), sink, ckpt)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.schema(
            "user_id bigint, session_start timestamp, "
            "session_end timestamp, n_events bigint"
        ).parquet(sink).collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(batch_events).collect()
    }
    assert got <= batch, sorted(got - batch)[:3]

    # -- CEP bursts: closed bursts ⊆ batch gaps-and-islands twin --
    sink, ckpt = f"{tmpdir}/bur_sink", f"{tmpdir}/bur_ckpt"
    _drain(error_bursts(_read_stream(spark, src)), sink, ckpt)
    got = {
        (r.user_id, r.burst_start, r.burst_end, r.n_errors)
        for r in spark.read.schema(
            "user_id bigint, burst_start timestamp, "
            "burst_end timestamp, n_errors bigint"
        ).parquet(sink).collect()
    }
    batch = {
        (r.user_id, r.burst_start, r.burst_end, r.n_errors)
        for r in error_bursts_batch(batch_events).collect()
    }
    assert got <= batch, sorted(got - batch)[:3]

    # -- running totals: final per-user state == batch aggregate --
    sink, ckpt = f"{tmpdir}/tot_sink", f"{tmpdir}/tot_ckpt"
    _drain(running_user_totals(_read_stream(spark, src)), sink, ckpt)
    _check_running_totals(spark, sink, batch_events)

@settings(
    max_examples=max(2, _EXAMPLES // 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=0, max_size=50))
def test_streaming_survives_out_of_order_arrival(spark, tmp_path_factory, rows):
    """Arrival order ≠ event time (micro-batches split by ORIGINAL
    index): later batches deliver events older than the advanced
    watermark. The strong stream==batch claims no longer apply — the
    contracts that DO survive reordering, pinned here on every example:

    - every query drains without crashing (the ADVICE-#5 clamp: an
      out-of-order error event merges into the open burst without
      moving burst_end backwards);
    - window emissions stay exactly-once per (window, event_type) key;
    - per-user bursts and sessions are well-formed (end ≥ start,
      count ≥ min) and non-overlapping — a late event can only merge
      into open state, never conjure an overlapping run;
    - running totals reach FULL batch equality: counts and sums are
      arrival-order-independent, so reordering must not change them.
    """
    from tv_event_streaming_spark.streaming.metrics import (
        error_bursts,
        running_user_totals,
        session_metrics,
        windowed_metrics,
    )

    tmpdir = str(tmp_path_factory.mktemp("streamfuzz_ooo"))
    src = _write_stream_chunks(rows, tmpdir, sort_by_time=False)
    batch_events = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).parquet(src)

    _WIN_SCHEMA = (
        "window_start timestamp, window_end timestamp, event_type string, "
        "invocations bigint, errors bigint, successes bigint"
    )

    # -- tumbling windows: drained + exactly-once per window key --
    sink, ckpt = f"{tmpdir}/win_sink", f"{tmpdir}/win_ckpt"
    _drain(windowed_metrics(_read_stream(spark, src)), sink, ckpt)
    win = spark.read.schema(_WIN_SCHEMA).parquet(sink).collect()
    keys = [(r.window_start, r.event_type) for r in win]
    assert len(keys) == len(set(keys)), "window emitted twice under reordering"

    # -- sessions: well-formed, non-overlapping per user --
    sink, ckpt = f"{tmpdir}/ses_sink", f"{tmpdir}/ses_ckpt"
    _drain(session_metrics(_read_stream(spark, src)), sink, ckpt)
    ses = spark.read.schema(
        "user_id bigint, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    ).parquet(sink).collect()
    by_user = {}
    for r in ses:
        assert r.session_end >= r.session_start and r.n_events >= 1, r
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2, ("overlapping sessions", spans)

    # -- bursts: well-formed, non-overlapping per user --
    sink, ckpt = f"{tmpdir}/bur_sink", f"{tmpdir}/bur_ckpt"
    _drain(error_bursts(_read_stream(spark, src)), sink, ckpt)
    bur = spark.read.schema(
        "user_id bigint, burst_start timestamp, "
        "burst_end timestamp, n_errors bigint"
    ).parquet(sink).collect()
    by_user = {}
    for r in bur:
        assert r.burst_end >= r.burst_start and r.n_errors >= 3, r
        by_user.setdefault(r.user_id, []).append((r.burst_start, r.burst_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2, ("overlapping bursts", spans)

    # -- running totals: order-independent, so FULL equality holds --
    sink, ckpt = f"{tmpdir}/tot_sink", f"{tmpdir}/tot_ckpt"
    _drain(running_user_totals(_read_stream(spark, src)), sink, ckpt)
    _check_running_totals(spark, sink, batch_events)
