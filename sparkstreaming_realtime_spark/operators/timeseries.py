"""Rolling time-series metrics over pre-aggregated daily rollups.

The reference's stats surface answers point-in-time aggregates (the
DAU endpoint's per-day totals, PublishServiceImpl.java's date-keyed
queries); production monitoring over the same rollups immediately
needs the SEQUENCE forms — day-over-day deltas, trailing 7-day
windows, running totals. These are window functions over the daily
rollup, NOT over the fact table:

Engine shape at 100 TB: the facts aggregate FIRST (one map-side-
partial shuffle down to |keys| × |days| rows — the rollup a year of
100 TB facts produces is ~keys·365 rows, trivially small), and every
window runs over that rollup partitioned by the series key, so the
per-partition sort is over days only. No window function ever touches
a fact row — putting a lag/rolling-sum window directly on the fact
table would sort the corpus per key, the classic window-over-facts
scale mistake this operator exists to prevent.

All values stay integer (cents/counts): lag deltas and rolling sums
are bigint arithmetic, deterministic across engines and partition
orders (the money_sum convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_metrics(
    daily: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    days: int = 7,
) -> DataFrame:
    """Per-key sequence metrics over a (key, date, value) daily
    rollup: previous-period delta, trailing-``days`` rolling sum, and
    the running total.

    ``value_col`` must be integer (cents, counts — never double: a
    windowed double sum re-orders under AQE). The trailing window is
    RANGE over calendar days (gaps shorten the window: a day with no
    row contributes nothing, and the frame still spans ``days``
    CALENDAR days, not rows — feed a gap-filled rollup if every frame
    must hold exactly ``days`` rows).

    Returns the rollup columns plus delta_<v>, rolling_<days>d_<v>,
    cum_<v> — delta is NULL on each key's first day (no previous
    period), matching SQL lag semantics in both engines."""
    day_int: Column = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    w = Window.partitionBy(key_col).orderBy(day_int)
    trailing = w.rangeBetween(-(days - 1), 0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value_col)
    return daily.select(
        F.col(key_col),
        F.col(date_col),
        v,
        (v - F.lag(value_col).over(w)).alias(f"delta_{value_col}"),
        F.sum(value_col).over(trailing).cast("bigint").alias(
            f"rolling_{days}d_{value_col}"
        ),
        F.sum(value_col).over(running).cast("bigint").alias(
            f"cum_{value_col}"
        ),
    )
