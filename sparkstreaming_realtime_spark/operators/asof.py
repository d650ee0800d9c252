"""As-of join — for every left row, the latest right row at or before
the left row's timestamp, per key.

Spark has no native as-of join (SURVEY §2.4 notes the reference
doesn't either); this is the classic union-and-carry composition of
built-in operators, no UDFs:

1. tag both sides and union them on (key, ts);
2. one window per key ordered by (ts, side) carries the most recent
   right-side payload forward (``last(..., ignorenulls=True)`` over
   unbounded-preceding — an O(n) running value, not a rank);
3. keep the left rows.

Cost: ONE shuffle on the key (the window partition), versus the
naive per-left-row subquery (quadratic) or an inequality join (range
explosion). The per-key sort is the unavoidable part of as-of
semantics. Skewed keys: pre-split hot keys by time-bucket before the
union (the bucket-boundary rows need a one-bucket lookback pass) —
documented, not automated.

Right-side rows must be unique per (key, ts) or the carried value is
nondeterministic — callers aggregate duplicates away first (the
registry query keeps one row per (customer, day)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
) -> DataFrame:
    """Left as-of join: all left columns ⊕ the payload of the latest
    right row with ``right_ts <= left_ts`` for the same key (nulls
    when no right row precedes)."""
    l_cols = list(left.columns)
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in payload_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in l_cols],
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    # right rows (side 0) sort before a left row at the same ts, so an
    # exactly-simultaneous right row IS visible to it (<= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt)
    for c in payload_cols:
        carried = carried.withColumn(
            f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *[F.col(f"__r_{c}").alias(c) for c in payload_cols],
    )
