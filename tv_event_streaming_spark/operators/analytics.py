"""Admin / observability analytics.

Reference: scripts/utils/dynamodb_inspector.sh:87-140 (jq analytics),
src/admin_lambda/admin_lambda.py:28-185 (table summaries, trailing-1h
metrics, latest-log-stream), remote smoke-test predicates
(SURVEY.md A1-A7, W1/W2, P7/P8).

Everything here is a single groupBy/window pass — partial (map-side)
aggregation applies to every count/sum, so these stay one-shuffle plans
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def distinct_preferences(user_prefs: DataFrame) -> DataFrame:
    """A1 — the global distinct-union of preferred ids per kind, sorted
    for determinism (ingestion.py:99-116)."""
    return user_prefs.select("kind", "pref_id").distinct()


def top_combinations(title_index: DataFrame, k: int = 20) -> DataFrame:
    """A3 — index rows per source×genre combination, top-k by count
    (dynamodb_inspector.sh:110-120). Deterministic tie-break on the key
    so LIMIT is stable across engines."""
    return (
        title_index.groupBy("source_id", "genre_id")
        .agg(F.count("*").alias("n_titles"))
        .orderBy(F.desc("n_titles"), "source_id", "genre_id")
        .limit(k)
    )


def data_quality_counts(titles: DataFrame) -> DataFrame:
    """A4/P7/P8 — the inspector's data-quality metrics in ONE pass
    (conditional sums instead of four scans): total titles, enriched
    (poster+plot present, web_api.py:203-207), unenriched
    (dynamodb_inspector.sh:126-132), rated>7 (web_api.py:233)."""
    enriched = (
        F.col("poster").isNotNull()
        & (F.col("poster") != "")
        & F.col("plot_overview").isNotNull()
        & (F.col("plot_overview") != "")
    )
    return titles.agg(
        F.count("*").alias("total_titles"),
        F.sum(F.when(enriched, 1).otherwise(0)).alias("enriched"),
        F.sum(F.when(~enriched, 1).otherwise(0)).alias("unenriched"),
        F.sum(F.when(F.col("user_rating") > 7, 1).otherwise(0)).alias("recommendable"),
    )


def table_summary(tables: dict[str, DataFrame]) -> DataFrame:
    """A5 — item_count per table (admin_lambda.py:28-49). Counts are
    metadata-cheap on parquet (row-group stats)."""
    out = None
    for name in sorted(tables):
        row = tables[name].agg(
            F.lit(name).alias("table_name"), F.count("*").alias("item_count")
        )
        out = row if out is None else out.unionAll(row)
    return out


def hourly_metrics(events: DataFrame) -> DataFrame:
    """A6 — the trailing-1h CloudWatch metric sum generalized to hourly
    buckets per event type (admin_lambda.py:72-150): invocation count,
    error count, ``success = max(0, n - errors)``."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("invocations"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        )
        .select(
            "hour",
            "event_type",
            "invocations",
            F.greatest(F.lit(0), F.col("invocations") - F.col("errors")).alias("successes"),
        )
    )


def value_percentiles(
    events: DataFrame, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Exact discrete percentiles of ``value`` per event_type via the
    rank construction (row at rank ceil(p·n) in partition order) —
    integer index selection, no interpolation arithmetic, so any engine
    produces identical doubles. Ties break on event_id.

    Scale: the window partitions by event_type, so each group sorts
    independently in parallel. For a 100 TB single-group percentile use
    ``approx_percentile`` (t-digest sketch, no cross-engine oracle —
    sketch internals are engine-specific) and keep this form as the
    verifier on samples."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    o = (
        events.filter(F.col("value").isNotNull())
        .select("event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias(f"p{int(round(p * 100))}")
        for p in ps
    ]
    return o.groupBy("event_type").agg(
        *aggs, F.max("n").cast("bigint").alias("n_values")
    )


def funnel_stages(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel per user: the first ``steps[0]`` event, then the
    first ``steps[1]`` at-or-after it, then the first ``steps[2]``
    at-or-after that — the classic conversion-funnel query. One small
    aggregation per step (each keyed on user_id, so the per-step joins
    co-partition and AQE broadcasts the shrinking step frames); no
    windows over the full event stream."""
    first, *rest = steps
    cur = (
        events.filter(F.col("event_type") == first)
        .groupBy("user_id")
        .agg(F.min("ts").alias(f"{first}_ts"))
    )
    out = cur
    prev_col = f"{first}_ts"
    for step in rest:
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(out.select("user_id", prev_col), "user_id")
            .filter(F.col("ts") >= F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"{step}_ts"))
        )
        out = out.join(nxt, "user_id", "left")
        prev_col = f"{step}_ts"
    stages = F.lit(1)
    for step in rest:
        stages = stages + F.when(F.col(f"{step}_ts").isNotNull(), 1).otherwise(0)
    return out.select(
        "user_id",
        *[F.col(f"{s}_ts") for s in steps],
        stages.cast("int").alias("stages_completed"),
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """W1 — latest-by-group: most recent event per user
    (admin_lambda.py:166-177's latest-log-stream). row_number over a
    (user_id) window; tie-broken on event_id for determinism."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization — the classic event-analytics window the
    reference never needed but any TV-events product grows into: a new
    session starts when a user is idle longer than ``gap_minutes``.

    Batch form of Spark's streaming ``session_window``: lag() detects
    gaps, a running sum numbers sessions, one groupBy summarizes. Two
    window passes + one aggregation, all partitioned on user_id — a
    single shuffle of the events table at any scale. Ties broken on
    event_id so session numbering is deterministic cross-engine."""
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    # exact integer microseconds — second-truncating casts disagree with
    # other engines on gaps that straddle the boundary fractionally
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


def tail_events(events: DataFrame, k: int = 20) -> DataFrame:
    """W2 — tail-k: the last k events (admin_lambda.py:179-185,
    startFromHead=False + limit). Deterministic tie-break on event_id;
    Spark executes this as TakeOrderedAndProject (no full sort)."""
    return events.orderBy(F.desc("ts"), F.desc("event_id")).limit(k).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def table_profile(events: DataFrame, approx: bool = False) -> DataFrame:
    """Data-profiling pass over the events stream — the pre-training
    sanity report every pipeline runs on a new drop: per tracked column,
    distinct count, null count, and min/max rendered as strings
    (one schema for heterogeneous column types). ONE aggregation job;
    count(DISTINCT a), count(DISTINCT b), ... in a single groupBy is
    planned by Spark as expand+two-phase partial aggregation, so each
    distinct spec shuffles its own (column, value) pairs — linear in the
    data, no per-column extra scans.

    ``approx=True`` is the 100 TB path: ``approx_count_distinct`` (HLL,
    rsd=0.01) replaces the exact distincts — the expand stage disappears
    (one fixed-size sketch per column per partition instead of shuffled
    (column, value) pairs), so the pass is a single map-side-collapsing
    aggregation regardless of cardinality. Exact mode is the
    oracle-checked catalog entry; approx mode's error bound is
    pytest-asserted (±5% at rsd=0.01)."""
    from .fanout import fan_out_scan  # noqa: PLC0415

    # r12: the expand stage (rows × (cols+1) for the exact distincts)
    # otherwise runs its partial aggregation on the scan's parallelism —
    # one task on an unsplittable file (measured 0.71 s single-task at
    # sf0.1). Scale-adaptive no-op on splittable inputs (fanout.py).
    events = fan_out_scan(events, "event_id")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggs = []
    for c in cols:
        # doubles render differently across engines (Java scientific
        # notation vs DuckDB decimal) — profile `value` on its exact
        # micro-quantized integer form instead
        v = (
            F.floor(F.col(c) * 1_000_000).cast("long")
            if c == "value"
            else F.col(c)
        )
        distinct = (
            F.approx_count_distinct(v, rsd=0.01)
            if approx
            else F.countDistinct(v)
        )
        aggs += [
            distinct.alias(f"{c}_distinct"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            # aggregate on the NATIVE type, cast the result — casting
            # first would make min/max lexicographic for numerics
            F.min(v).cast("string").alias(f"{c}_min"),
            F.max(v).cast("string").alias(f"{c}_max"),
        ]
    wide = events.agg(F.count("*").alias("n_rows"), *aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"{c}_distinct").alias("n_distinct"),
                    F.col(f"{c}_nulls").alias("n_nulls"),
                    F.col(f"{c}_min").alias("min_str"),
                    F.col(f"{c}_max").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return wide.select("n_rows", per_col).select(
        "p.col_name", "n_rows", "p.n_distinct", "p.n_nulls", "p.min_str", "p.max_str"
    )


def daily_retention(events: DataFrame) -> DataFrame:
    """Day-over-day cohort retention — the growth-analytics staple
    (no reference analogue; the events table is the natural host):
    for each active day, how many of that day's users were ALSO active
    the previous day, and the retention rate.

    Shape: distinct (user_id, day) collapses the corpus map-side before
    anything windowed runs; lag() over the per-user day sequence marks
    retained days; one date-sized groupBy finishes. The only corpus
    shuffle is the distinct; the window and final agg run on
    users×active-days rows. Rate = exact integer counts through one
    double division — bit-identical cross-engine."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = days.withColumn(
        "retained",
        F.when(
            F.date_diff(F.col("day"), F.lag("day").over(w)) == 1, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    # day emitted as midnight TIMESTAMP, not DATE: pandas/Arrow bridges
    # canonicalize DATE differently per engine (the hourly_metrics
    # date_trunc precedent), and the lag arithmetic above already ran
    # on true DATEs
    return (
        marked.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum("retained").cast("long").alias("n_retained"),
            (
                F.sum("retained").cast("double") / F.count("*").cast("double")
            ).alias("retention_rate"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "n_active",
            "n_retained",
            "retention_rate",
        )
    )


def rolling_event_window(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Per-EVENT trailing window — for every event, that user's count
    and value sum over the preceding ``window_minutes`` (inclusive of
    the current row): the continuous form of the bucketed trailing-1h
    metric (A6), and the one window shape nothing else in the catalog
    exercises — a RANGE frame (value-based bounds on exact integer
    microseconds, so frame membership is deterministic cross-engine;
    peers at the same (user, ts) are in-frame on both engines by the
    RANGE definition).

    One shuffle on user_id; the frame scan is the standard sliding
    aggregation within each sorted partition. Value sums accumulate in
    DECIMAL with one final double cast."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-window_minutes * 60 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("value_trailing"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_event_pivot(events: DataFrame) -> DataFrame:
    """Wide daily activity matrix — one row per day, one count column
    per event type: the pivot (long→wide) operator family. The pivot
    value list is EXPLICIT (the deterministic-schema requirement: an
    inferred pivot runs an extra distinct job and its column order
    depends on the data); Spark executes it as a single groupBy with
    PivotFirst — one shuffle on day, map-side partials, never a
    per-type pass."""
    day = F.date_trunc("day", F.col("ts")).alias("day")
    pivoted = (
        events.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def daily_event_unpivot(events: DataFrame) -> DataFrame:
    """The inverse (wide→long, ``unpivot``/melt): the daily matrix back
    to (day, event_type, n) rows — the shape every metrics store
    ingests. Runs map-side over the already-aggregated wide frame
    (Spark's Expand node: one input row → n_types output rows, no
    shuffle beyond the pivot's own); zero-count cells are kept (the
    honest dense matrix) so the long form is exactly days × types."""
    wide = daily_event_pivot(events)
    return wide.unpivot(
        ["day"],
        [f"n_{t}" for t in EVENT_TYPES],
        "event_type",
        "n",
    ).select(
        "day",
        F.expr("substring(event_type, 3)").alias("event_type"),
        F.col("n").cast("long").alias("n"),
    )
