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


def anomaly_days(
    daily: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    trailing: int = 28,
    min_baseline: int = 8,
    z: int = 3,
) -> DataFrame:
    """Per-key anomalous days: value outside ``z`` sample standard
    deviations of its own trailing-``trailing``-day baseline (the
    window EXCLUDES the current day — an anomaly must not dilute the
    baseline judging it). The distribution-shift tripwire a training
    pipeline runs over every ingest rollup.

    The z-test runs in EXACT integer arithmetic — no mean, stddev, or
    sqrt ever materializes as a float. With baseline count n, sum s,
    sum of squares ss over integer values x:

        |x − s/n| > z·sqrt((ss − s²/n)/(n−1))
      ⟺ (x·n − s)²·(n−1) > z²·(n·ss − s²)·n        (n > 1, squared)

    Every term is a product of exact integers (decimal(38,0)
    accumulators — cents² per row exceeds int64 at 100 TB group
    sizes; DuckDB mirrors with HUGEINT), so the flag is
    bit-deterministic across engines and partitionings — a float
    z-score would flip at boundaries exactly like an unscaled money
    sum. Sample variance (n−1) matches SQL stddev_samp semantics.

    Engine shape: same as :func:`rolling_metrics` — windows run over
    the pre-aggregated daily rollup only, partitioned by key. Returns
    ONLY the anomalous rows (key, date, value, baseline_n,
    baseline_sum) with baseline_n ≥ ``min_baseline``; a day whose
    baseline has zero variance flags on ANY deviation (the strictest
    reading; callers wanting tolerance add it to the rollup)."""
    day_int = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    w = Window.partitionBy(key_col).orderBy(day_int).rangeBetween(
        -trailing, -1
    )
    dec = "decimal(38,0)"
    v = F.col(value_col).cast(dec)
    stats = daily.select(
        F.col(key_col),
        F.col(date_col),
        F.col(value_col),
        F.count(value_col).over(w).alias("__n"),
        F.sum(value_col).over(w).cast(dec).alias("__s"),
        F.sum(v * v).over(w).cast(dec).alias("__ss"),
    )
    n = F.col("__n").cast(dec)
    s = F.col("__s")
    ss = F.col("__ss")
    x = F.col(value_col).cast(dec)
    # bind the shared subterms in their own projection: Catalyst has
    # no CSE across the comparison's big decimal products, and one
    # flat expression tree measured ~60 s of one-time Janino codegen —
    # binding __d/__var roughly halves the generated class
    bound = stats.withColumn("__d", x * n - s).withColumn(
        "__var", (n * ss - s * s) * n
    )
    lhs = F.col("__d") * F.col("__d") * (n - 1)
    rhs = F.lit(z * z).cast(dec) * F.col("__var")
    return (
        bound.filter(F.col("__n") >= min_baseline)
        .filter(lhs > rhs)
        .select(
            key_col,
            date_col,
            value_col,
            F.col("__n").cast("bigint").alias("baseline_n"),
            F.col("__s").cast("bigint").alias("baseline_sum"),
        )
    )
