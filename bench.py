#!/usr/bin/env python3
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "catalog_total", "value": <sec>, "unit": "sec",
     "queries": {...slowest entries...}, "n_queries": N, "sf": 0.1,
     "streaming": {...}, "details": "bench_full.json"}

The final stdout line is deliberately SHORT: the driver tail-captures
only the last ~2 KB of output, and the full 100+-entry per-query map
outgrew that in round 5 (BENCH_r05 recorded ``parsed: null``). The
complete per-query map goes to ``bench_full.json`` next to this script
and to stderr; the stdout summary carries the total, the slowest
entries, and the streaming cascade numbers.

Each query executes end-to-end into the no-op sink (full computation,
zero write cost). Timings exclude session startup.

Timing is steady-state (JMH-style): each query runs once untimed, then
up to three timed runs (stopping early once a run lands ≤1.5s); the
MINIMUM is reported. Rationale: a cold
execution's cost is dominated by single-shot JVM effects — Janino
codegen compile plus HotSpot C2 compile-queue backlog from the
preceding queries' hundreds of generated classes — which we measured at
9-56s of nondeterministic noise for identical 0.6-3s plans (tasks run
interpreted while their generated methods wait in the JIT queue; a
fresh session runs the same plan 5-20x faster). On the 100 TB target
those one-time costs amortize to zero; min-of-3 steady-state is the
number that tracks plan quality. Cold timings still print on stderr.

Hypervisor steal is sampled from ``/proc/stat`` around every entry and
canary (r11 close-bench lesson: vmstat ``st`` bursts of 16-17% were the
noise mechanism behind apparent movers). ``bench_full.json`` carries the
per-entry ``steal`` map; the stdout summary carries ``steal_run_pct`` /
``steal_max_pct`` so a mover can be dispositioned host-vs-code without a
separate vmstat session.

Round-12 sharpening: steal is ALSO sampled per timed attempt, and the
recorded number is paired with the steal of exactly the attempt that
produced the min (``steal_min`` map). The whole-entry window
(``steal`` map) can show 8% steal while the min attempt ran in a quiet
sub-window — per-attempt sampling makes the host-vs-code call exact
instead of conservative. When the min attempt itself was contaminated
(``_RETRY_STEAL_PCT`` = 3% steal) the entry earns extra timed attempts
from a bounded global budget (``retry_budget`` = 12 across the run), so
one noisy burst doesn't become the round's recorded wall for that
entry; a fully-noisy box exhausts the budget and the contamination
stays visible in ``steal_min``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tv_event_streaming_spark.plans import CATALOG  # noqa: E402
from tv_event_streaming_spark.session import get_spark  # noqa: E402

# The full catalog, in registration order — every entry is benched, so a
# newly-registered operator can't silently miss performance coverage.
BENCH_QUERIES = list(CATALOG)


def warmup(spark) -> None:
    """Exercise codegen, shuffle, broadcast and the noop sink once so the
    first timed query doesn't absorb one-time JVM/JIT warm-up. Touches no
    benchmark table — only synthetic ranges."""
    from pyspark.sql import functions as F

    a = spark.range(1_000_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").cast("double").alias("v")
    )
    b = spark.range(97).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    (
        a.join(F.broadcast(b), "k")
        .groupBy("k", "tag")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    # spin up the Arrow/Python worker pool (mapInPandas queries otherwise
    # pay ~10 s of per-executor daemon startup inside their timing)
    def _ident(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(
        _ident, schema="id long"
    ).write.format("noop").mode("overwrite").save()


def canary(spark) -> float:
    """Constant-work canary: a FIXED synthetic plan — shuffle agg +
    broadcast join + window over deterministic ranges, no table reads —
    timed exactly like a catalog entry (min of 3 steady-state runs).
    Its mix (exchange, hash agg, codegen arithmetic, window sort)
    tracks the same host factors that move the catalog total, so
    ``catalog_total / canary_sec`` self-normalizes round-over-round
    comparisons against the documented ±15% cross-day host drift
    (three rounds of "is it the box or the code" forensics — r6
    verdict What's-wrong #3). NEVER change this plan: its value is
    being identical in every round's record.

    DEMOTED to tie-breaker from round 10 (SCALE.md §6g): the round-9
    same-code A/B showed this 0.5 s wall is JIT/startup-shaped and
    over-responds to host state (−24% on identical plans while raw
    moved −5.6%); ``canary5_sec`` (:func:`canary_sustained`) is the
    primary divisor. Still recorded every round — the r7 normalized
    series rides it, and two witnesses moving together = host."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def build():
        a = spark.range(4_000_000).select(
            (F.col("id") % 9973).alias("k"),
            (F.col("id") % 211).alias("g"),
            (F.sin(F.col("id").cast("double")) * 100.0).alias("v"),
        )
        dim = spark.range(9973).select(
            F.col("id").alias("k"), (F.col("id") % 17).alias("tag")
        )
        agg = (
            a.join(F.broadcast(dim), "k")
            .groupBy("k", "tag")
            .agg(
                F.sum("v").alias("s"),
                F.count("*").alias("n"),
                F.max("g").alias("mg"),
            )
        )
        w = Window.partitionBy("tag").orderBy(F.desc("s"))
        return (
            agg.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 100)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    build()  # untimed warm run
    best = float("inf")
    for _ in range(3):
        time.sleep(0.3)
        t0 = time.perf_counter()
        build()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def canary_sustained(spark) -> float:
    """The ~5 s canary (VERDICT r7 #4): the SAME plan shape as
    :func:`canary` at 16× the fact rows, so sustained shuffle/agg/window
    throughput — not fixed per-job overhead — dominates the time. The
    0.5 s canary is JVM-state-dominated (measured spread SCALE.md §6f)
    and normalizes same-source records only; this one is the
    cross-machine-credible divisor. Recorded alongside (``canary5_sec``)
    from round 8 — the r7 normalized series stays on the old canary.
    NEVER change this plan either."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def build():
        a = spark.range(64_000_000).select(
            (F.col("id") % 99991).alias("k"),
            (F.col("id") % 211).alias("g"),
            (F.sin(F.col("id").cast("double")) * 100.0).alias("v"),
        )
        dim = spark.range(99991).select(
            F.col("id").alias("k"), (F.col("id") % 17).alias("tag")
        )
        agg = (
            a.join(F.broadcast(dim), "k")
            .groupBy("k", "tag")
            .agg(
                F.sum("v").alias("s"),
                F.count("*").alias("n"),
                F.max("g").alias("mg"),
            )
        )
        w = Window.partitionBy("tag").orderBy(F.desc("s"))
        return (
            agg.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 100)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    build()  # untimed warm run
    best = float("inf")
    for _ in range(3):
        time.sleep(0.3)
        t0 = time.perf_counter()
        build()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def canary_strings(spark, sf_dir: str) -> float:
    """The string/scan canary (VERDICT r10 What's-wrong #2): the round-10
    close found a host profile NEITHER existing canary spans — a box that
    runs CPU-synthetic shuffle/agg plans fast and string/parquet-scan
    work slow (catalog +22% while both canaries got FASTER; the manual
    per-entry forensics landed on untouched text entries as the slowest
    movers). This witness covers that dimension mechanically: a parquet
    scan of the documents table (real IO + string-column decode) feeding
    regexp/split/array kernels (lower, split, regexp_extract_all,
    array_distinct, higher-order filter, concat_ws/slice) — zero
    shuffle, zero joins, so it moves with string/scan throughput and
    nothing else. The 8× per-row amplification makes the string work
    dominate the fixed plan overhead at sf0.1's 5 000-doc table
    (measured ~2.4 s steady-state on the r11 build box).

    Comparable round-over-round because the driver always benches at
    sf0.1 (same parquet bytes every round); at other --sf values it
    scales with the table and only same-sf records compare. NEVER
    change this plan: its value is being identical in every round's
    record (``canary_str_sec``). Disposition rule stays two-of-three:
    witnesses moving together = host, a lone mover = code."""
    from pyspark.sql import functions as F

    def build():
        d = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        amp = d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("rep"),
            "text",
        )
        toks = amp.select(
            "doc_id",
            "rep",
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+").alias("toks"),
            F.length("text").alias("chars"),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]{4,}"), 0)
            ).alias("n_words4"),
        )
        return (
            toks.select(
                "doc_id",
                "rep",
                "chars",
                "n_words4",
                F.size("toks").alias("n_toks"),
                F.size(F.array_distinct("toks")).alias("n_uniq"),
                F.size(F.filter("toks", lambda t: F.length(t) > 6)).alias(
                    "n_long"
                ),
                F.substring(
                    F.concat_ws(" ", F.slice("toks", 1, 32)), 1, 64
                ).alias("head"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    build()  # untimed warm run
    best = float("inf")
    for _ in range(3):
        time.sleep(0.3)
        t0 = time.perf_counter()
        build()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _proc_stat() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate ``cpu`` line of
    ``/proc/stat`` — or None where it's unreadable (non-Linux).
    ``steal/total`` over an interval is exactly vmstat's ``st``
    column: the % of CPU time the hypervisor ran someone else while
    this guest was runnable."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    if not parts or parts[0] != "cpu" or len(parts) < 2:
        return None
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _steal_pct(before, after) -> float | None:
    """Steal % of total CPU ticks between two :func:`_proc_stat`
    samples (None if either sample failed or no ticks elapsed)."""
    if not before or not after or after[1] <= before[1]:
        return None
    return round(100.0 * (after[0] - before[0]) / (after[1] - before[1]), 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")
    warmup(spark)

    timings: dict[str, float] = {}
    # Hypervisor-steal witness (VERDICT r11 #4): the r11 close-bench
    # forensics identified CPU steal (vmstat st=16-17%) as the noise
    # mechanism behind apparent movers; recording steal around each
    # entry makes that disposition mechanical instead of prose. A mover
    # whose window shows double-digit steal is host, not code.
    steal: dict[str, float] = {}
    # Per-attempt refinement (round 12): steal of exactly the attempt
    # that produced the recorded min — the whole-entry window above is
    # conservative (it includes cold + all attempts), this one is the
    # number the min actually ran under.
    steal_min: dict[str, float] = {}
    # Global budget of EXTRA attempts granted to entries whose min
    # attempt was steal-contaminated (≥ _RETRY_STEAL_PCT). Bounded so a
    # fully-noisy box adds ≤ ~1 min to the bench wall instead of
    # doubling it; when the budget runs out the contamination is still
    # recorded in steal_min for the disposition read.
    _RETRY_STEAL_PCT = 3.0
    retry_budget = 12
    run_s0 = _proc_stat()
    for name in BENCH_QUERIES:
        entry = CATALOG[name]
        entry_s0 = _proc_stat()
        t0 = time.perf_counter()
        entry.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        best = float("inf")
        best_steal: float | None = None

        def timed_attempt():
            # Attempt-scoped cache clear: builders persist shared
            # sub-plans (MEMORY_AND_DISK), and Spark's CacheManager
            # substitutes cached plans by LOGICAL-PLAN equality — so a
            # repeat build() of the same entry silently reads the prior
            # attempt's blocks and reports the warm-cache time (measured
            # 4.6 s cached vs 14.8 s cold for curation_pipeline_neardup).
            # Clearing before every timed run makes each attempt pay its
            # own persist compute (JIT stays warm — that's the
            # steady-state being measured) and doubles as the
            # storage-memory hygiene between entries.
            spark.catalog.clearCache()
            time.sleep(0.3)  # let the C2 compile queue drain new classes
            a_s0 = _proc_stat()
            t1 = time.perf_counter()
            entry.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t1, _steal_pct(a_s0, _proc_stat())

        # Up to 3 timed runs; ALWAYS at least 2 unless a run lands ≤1.5 s
        # (spikes are upward, so a fast run can't be one). Heaviness is
        # judged from the first TIMED run, not the cold run: round 5's
        # driver recorded simhash_signatures at 11.88 s because a >10 s
        # cold spike downgraded the entry to a single timed attempt which
        # also spiked (judge A/B: 1.16 s steady-state).
        max_attempts = 3
        attempt = 0
        while attempt < max_attempts:
            elapsed, a_st = timed_attempt()
            if elapsed < best:
                best, best_steal = elapsed, a_st
            attempt += 1
            if best <= 1.5:  # already steady; don't burn bench wall-clock
                break
            if attempt == 1 and elapsed > 10.0:
                max_attempts = 2  # heavy entry: one more timed run, min of 2
        # Steal-gated retries: the min attempt itself ran under steal —
        # the recorded wall is host-inflated. Spend bounded extra
        # attempts to find a quiet window; stop as soon as one lands.
        while (
            best > 1.5
            and best_steal is not None
            and best_steal >= _RETRY_STEAL_PCT
            and retry_budget > 0
        ):
            retry_budget -= 1
            elapsed, a_st = timed_attempt()
            if elapsed < best:
                best, best_steal = elapsed, a_st
            if a_st is not None and a_st < _RETRY_STEAL_PCT:
                break  # quiet attempt happened; min is now trustworthy
        timings[name] = round(best, 3)
        st = _steal_pct(entry_s0, _proc_stat())
        if st is not None:
            steal[name] = st
        if best_steal is not None:
            steal_min[name] = best_steal
        print(
            f"# {name}: {timings[name]:.3f}s (cold {cold:.3f}s"
            + (f", steal {st:.1f}%" if st is not None else "")
            + (
                f", steal@min {best_steal:.1f}%"
                if best_steal is not None
                else ""
            )
            + ")",
            file=sys.stderr,
        )
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    canary_steal: dict[str, float] = {}
    c_s0 = _proc_stat()
    canary_sec = canary(spark)
    c_s1 = _proc_stat()
    canary5_sec = canary_sustained(spark)
    c_s2 = _proc_stat()
    canary_str_sec = canary_strings(spark, sf_dir)
    c_s3 = _proc_stat()
    for key, pct in (
        ("canary", _steal_pct(c_s0, c_s1)),
        ("canary5", _steal_pct(c_s1, c_s2)),
        ("canary_str", _steal_pct(c_s2, c_s3)),
    ):
        if pct is not None:
            canary_steal[key] = pct
    print(
        f"# canary: {canary_sec:.3f}s  canary5: {canary5_sec:.3f}s"
        f"  canary_str: {canary_str_sec:.3f}s  steal: {canary_steal}",
        file=sys.stderr,
    )
    streaming = None
    # Streaming cascade (producer → consumer → CDC enrichment): the
    # reference's only end-to-end latency anchor is the ≤90 s smoke-test
    # allowance on this exact path, so bench it as a first-class row.
    # Disable with SPARK_GRAFT_STREAMING_BENCH=0.
    if os.environ.get("SPARK_GRAFT_STREAMING_BENCH", "1") != "0":
        from tools.bench_streaming import bench_cascade  # noqa: PLC0415

        try:
            streaming = bench_cascade(spark, sf_dir)
            print(f"# streaming cascade: {streaming}", file=sys.stderr)
        except Exception as exc:  # never fail the catalog numbers
            streaming = {"error": str(exc)[:300]}

    # Full record → file + stderr (the per-query map no longer fits the
    # driver's ~2 KB tail capture at 100+ entries).
    full = {
        "metric": "catalog_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
        "canary_sec": canary_sec,
        "canary5_sec": canary5_sec,
        "canary_str_sec": canary_str_sec,
        "catalog_total_normalized": round(total / canary_sec, 2),
        "catalog_total_normalized5": round(total / canary5_sec, 2),
        "streaming": streaming,
        "steal": steal,
        "steal_min": steal_min,
        "canary_steal": canary_steal,
        "steal_run_pct": _steal_pct(run_s0, _proc_stat()),
        "steal_max_pct": round(max(steal.values()), 2) if steal else None,
        # Max steal among the attempts that produced the recorded mins,
        # over HEAVY entries only (recorded time > 1.5 s — the ones the
        # mover analysis reads; sub-second entries have sub-second steal
        # windows whose pct is all variance and whose absolute inflation
        # is noise-floor). The honest "was any number that matters
        # host-inflated" bound: steal_max_pct spans whole entry windows
        # incl. discarded attempts, so it over-reads noise the recorded
        # mins never saw.
        "steal_min_max_pct": (
            round(
                max(
                    (
                        pct
                        for nm, pct in steal_min.items()
                        if timings.get(nm, 0.0) > 1.5
                    ),
                    default=0.0,
                ),
                2,
            )
            if steal_min
            else None
        ),
    }
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(details_path, "w") as fh:
        json.dump(full, fh, indent=1)
    print(f"# full per-query record: {json.dumps(full)}", file=sys.stderr)

    # Short stdout summary (must stay well under the tail buffer): the
    # slowest entries stand in for the full map.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    out = {
        "metric": "catalog_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "sf": sf,
        "canary_sec": canary_sec,
        "canary5_sec": canary5_sec,
        "canary_str_sec": canary_str_sec,
        "catalog_total_normalized": round(total / canary_sec, 2),
        "catalog_total_normalized5": round(total / canary5_sec, 2),
        "steal_run_pct": full["steal_run_pct"],
        "steal_max_pct": full["steal_max_pct"],
        "steal_min_max_pct": full["steal_min_max_pct"],
        "details": "bench_full.json",
    }
    if streaming is not None:
        out["streaming"] = {
            k: streaming[k]
            for k in (
                "total_sec", "produce_sec", "consume_sec", "enrich_sec",
                "index_rows_per_sec", "steal_pct",
            )
            if k in streaming
        } or streaming
    line = json.dumps(out)
    if len(line) > 1500:  # never emit an unparseable (truncated) tail line
        out["queries"] = {}
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
