"""Bucketed time-range join: pair left rows with right rows whose
timestamp falls in ``[left_ts, left_ts + window)`` for the same key.

A naive inequality join degenerates to a per-key nested loop (range
"joins" in most engines are nested-loop unless specially planned).
The scale-safe composition bucketizes time by the window length:

- a right row at time t can only match left rows in time bucket
  ``floor(t/W)`` or the one before, so the right side emits ≤2
  (key, bucket) rows;
- the join becomes a plain **equi-join** on (key, bucket) — hash
  shuffle, AQE-eligible, no nested loop;
- the exact range predicate filters the ≤2× candidates.

Cost: one shuffle per side on (key, bucket), candidate factor ≤2.
A window far larger than the per-bucket data span would put
everything in one bucket — pick W equal to the query's range (as the
registry query does) or split oversized buckets with the salting
helper (functions/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Count right rows per left row within
    ``[left_ts, left_ts + window)``; left rows with no match keep 0.

    The aggregate form keeps outputs small; the pair form is the same
    plan minus the final groupBy. Left columns must identify rows
    uniquely (they are the grouping key for the count).
    ``left`` and ``right`` must not share column names besides
    ``key``."""
    w = window_seconds
    l = left.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(left_ts)) / w)
    )
    rsec = F.floor(F.unix_timestamp(F.col(right_ts)) / w)
    r = right.select(F.col(key), F.col(right_ts)).withColumn(
        "__b", F.explode(F.array(rsec - 1, rsec))
    )
    in_range = (
        F.col(right_ts).isNotNull()
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.unix_timestamp(F.col(right_ts))
            < F.unix_timestamp(F.col(left_ts)) + w
        )
    )
    out_keys = [c for c in left.columns]
    return (
        l.join(r, [key, "__b"], "left")
        .withColumn("__hit", F.when(in_range, 1).otherwise(0))
        .groupBy(*out_keys)
        .agg(F.sum("__hit").cast("bigint").alias("n_in_range"))
    )
