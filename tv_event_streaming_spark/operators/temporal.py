"""Temporal joins Spark lacks as primitives: as-of (backward) and
bounded range joins, built as shuffle-disciplined compositions.

- **As-of join** — for each left row, the single right row with the
  greatest timestamp ≤ the left timestamp, per key. Implemented with the
  union + running ``last_value(ignore nulls)`` construction: ONE shuffle
  (the window partition on the key), no per-key loops, no inequality
  join. This is the time-series enrichment primitive (attach the
  prevailing dimension/state to each event).
- **Range join** — pairs within a bounded time interval. A naive
  ``t BETWEEN lo AND hi`` join is a BroadcastNestedLoopJoin (O(N·M));
  bucketing both sides to interval-width buckets turns it into an
  equi-join on (key, bucket) + exact residual filter — each row lands in
  ≤2 buckets, so the join is linear in candidates. The standard
  interval-bucket trick every time-series engine uses.

Both have exact SQL twins: the as-of oracle mirrors the SAME union +
window construction (deterministic ties included); the range oracle is
the plain inequality join (DuckDB's IEJoin executes it directly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach to each left row the right row with max ``right_ts`` ≤
    ``left_ts`` for the same key (backward as-of; NULL values when no
    such row). ``tiebreak`` orders right rows sharing (key, ts) — the
    largest wins; pass a unique right column for determinism.

    Plan shape: union the two sides with right's value columns NULL on
    the left side, run one running ``last(ignore nulls)`` window
    partitioned by key ordered by (ts, side, tiebreak), keep left rows.
    One Exchange total; both inputs stream through it once."""
    tb = tiebreak or value_cols[0]
    out_left = [c for c in left.columns]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    l_side = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in out_left],
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
    )
    r_side = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in out_left],
        *[F.col(c) for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc_nulls_first(),
            F.col("_side").asc_nulls_first(),
            F.col(tb).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        "_side",
        *out_left,
        *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).select(
        *out_left, *[F.col(f"_f_{c}").alias(c) for c in value_cols]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower: Column | None = None,
    window_seconds: int = 3600,
) -> DataFrame:
    """Candidate pairs with ``right_ts`` in the half-open interval
    ``(left_ts - window, left_ts]`` for the same key, via the
    interval-bucket equi-join: both sides bucket their timestamps by the
    window width; a right row can only match left rows in its own or the
    next bucket, so the left side expands to 2 bucket keys and the join
    is a plain equi-join + exact residual filter — never a nested-loop
    inequality join. Output: all left columns + all right columns
    (caller aggregates)."""
    wsec = F.lit(window_seconds)
    lb = (F.unix_timestamp(F.col(left_ts)) / wsec).cast("long")
    rb = (F.unix_timestamp(F.col(right_ts)) / wsec).cast("long")

    l = left.select(
        *left.columns,
        F.col(left_key).alias("_k"),
        F.explode(F.array(lb.cast("long"), (lb - 1).cast("long"))).alias("_lb"),
    )
    r = right.select(
        *right.columns,
        F.col(right_key).alias("_rk"),
        rb.alias("_rb"),
    )
    joined = l.join(
        r, (F.col("_k") == F.col("_rk")) & (F.col("_lb") == F.col("_rb"))
    )
    in_range = (
        F.col(right_ts) > F.col(left_ts) - F.make_interval(secs=wsec)
    ) & (F.col(right_ts) <= F.col(left_ts))
    return joined.filter(in_range).drop("_k", "_rk", "_lb", "_rb")
