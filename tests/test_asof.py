"""Unit tests for the as-of join (union-and-carry composition)."""

from __future__ import annotations

from sparkstreaming_realtime_spark.operators.asof import as_of_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 12:00:00"),
            (3, "u1", "2024-01-01 08:00:00"),  # before any right row
            (4, "u2", "2024-01-01 10:00:00"),  # simultaneous with right
            (5, "u3", "2024-01-01 10:00:00"),  # key with no right rows
        ],
        "event_id long, user_id string, ts string",
    )
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:00:00", 100),
            ("u1", "2024-01-01 11:00:00", 101),
            ("u2", "2024-01-01 10:00:00", 200),  # ties left ts exactly
        ],
        "user_id string, ots string, val int",
    )
    return left, right


def test_as_of_join_semantics(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["val"]
        for r in as_of_join(
            left, right, key="user_id", left_ts="ts", right_ts="ots",
            payload_cols=("val",),
        ).collect()
    }
    assert got[1] == 100   # 10:00 sees the 09:00 row, not 11:00
    assert got[2] == 101   # 12:00 sees the latest (11:00)
    assert got[3] is None  # nothing precedes 08:00
    assert got[4] == 200   # exactly-simultaneous right row IS visible
    assert got[5] is None  # key never on the right


def test_as_of_join_keeps_all_left_rows(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, "user_id", "ts", "ots", ("val",))
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "user_id", "ts", "val"}


def test_range_join_count_boundaries(spark):
    """Range [lts, lts+w): inclusive start, exclusive end, cross-bucket
    matches counted, other keys ignored."""
    from pyspark.sql import functions as F

    from sparkstreaming_realtime_spark.operators.range_join import (
        range_join_count,
    )

    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"), (2, "u2", "2024-01-01 10:00:00")],
        "oid long, user_id string, ots string",
    ).withColumn("ots", F.col("ots").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00"),  # == start → counted
            ("u1", "2024-01-01 10:59:59"),  # inside → counted
            ("u1", "2024-01-01 11:00:00"),  # == end → excluded
            ("u1", "2024-01-01 09:59:59"),  # before → excluded
            ("u2", "2024-01-01 10:30:00"),  # other key
        ],
        "user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["oid"]: r["n_in_range"]
        for r in range_join_count(
            left, right, "user_id", "ots", "ts", window_seconds=3600
        ).collect()
    }
    assert got == {1: 2, 2: 1}
