"""Edge semantics of the temporal join operators: boundary inclusion,
ties, missing matches, and cross-bucket candidates."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tv_event_streaming_spark.operators.temporal import (
    asof_join_backward,
    range_join_bucketed,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after both orders
            (2, 10, _ts("2024-01-01T08:00:00")),  # exactly at order A: inclusive
            (3, 10, _ts("2024-01-01T07:00:00")),  # before all orders -> NULLs
            (4, 20, _ts("2024-01-01T10:00:00")),  # other key, no orders -> NULLs
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T08:00:00"), 5.0),
            (101, 10, _ts("2024-01-01T09:00:00"), 7.0),
            (102, 10, _ts("2024-01-01T09:00:00"), 9.0),  # tie: larger key wins
        ],
        "o_id long, o_user long, o_ts timestamp, amount double",
    )
    out = asof_join_backward(
        left, right, "user_id", "o_user", "ts", "o_ts",
        value_cols=["o_id", "amount"], tiebreak="o_id",
    )
    got = {r.event_id: (r.o_id, r.amount) for r in out.collect()}
    assert got[1] == (102, 9.0)  # latest order, tie broken by larger o_id
    assert got[2] == (100, 5.0)  # boundary ts == order ts is matched
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert len(got) == 4  # left-join semantics: every left row survives


def test_range_join_bucket_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T10:30:00"))],
        "err_id long, user_id long, err_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (50, 7, _ts("2024-01-01T09:30:00")),  # exactly -1h: EXCLUDED (strict >)
            (51, 7, _ts("2024-01-01T09:30:01")),  # just inside, previous bucket
            (52, 7, _ts("2024-01-01T10:30:00")),  # boundary: INCLUDED (<=)
            (53, 7, _ts("2024-01-01T10:31:00")),  # after: excluded
            (54, 8, _ts("2024-01-01T10:00:00")),  # other key: excluded
        ],
        "src_id long, src_user long, src_ts timestamp",
    )
    out = range_join_bucketed(
        left, right, "user_id", "src_user", "err_ts", "src_ts",
        window_seconds=3600,
    )
    got = sorted(r.src_id for r in out.collect())
    assert got == [51, 52]
