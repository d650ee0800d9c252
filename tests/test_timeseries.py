"""Rolling sequence metrics (operators/timeseries.py): hand-computed
values on a gappy series — the RANGE frame must span calendar days,
not rows, and every metric is bigint (order-independent)."""

from __future__ import annotations

import datetime

from sparkstreaming_realtime_spark.operators.timeseries import (
    rolling_metrics,
)


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_rolling_metrics_hand_computed_with_gaps(spark):
    daily = spark.createDataFrame(
        [
            ("a", _d("2024-01-01"), 100),
            ("a", _d("2024-01-02"), 50),
            # gap: Jan 3-7 missing
            ("a", _d("2024-01-08"), 10),
            ("b", _d("2024-01-01"), 7),
        ],
        "k string, d date, v long",
    )
    out = {
        (r.k, str(r.d)): (r.delta_v, r.rolling_7d_v, r.cum_v)
        for r in rolling_metrics(daily, "k", "d", "v", days=7).collect()
    }
    assert out[("a", "2024-01-01")] == (None, 100, 100)
    assert out[("a", "2024-01-02")] == (-50, 150, 150)
    # Jan 8: trailing 7 CALENDAR days = Jan 2..8 -> 50 + 10; the
    # delta is vs the previous ROW (Jan 2), standard lag semantics
    assert out[("a", "2024-01-08")] == (-40, 60, 160)
    # key b is an independent series
    assert out[("b", "2024-01-01")] == (None, 7, 7)


def test_rolling_metrics_partitioning_independent(spark):
    daily = spark.createDataFrame(
        [
            (f"k{i % 5}", _d("2024-01-01") + datetime.timedelta(days=i % 11), (i * 37) % 1000)
            for i in range(55)
        ],
        "k string, d date, v long",
    ).groupBy("k", "d").agg({"v": "sum"}).withColumnRenamed("sum(v)", "v")
    a = sorted(
        map(tuple, rolling_metrics(daily, "k", "d", "v").collect())
    )
    b = sorted(
        map(
            tuple,
            rolling_metrics(
                daily.repartition(13), "k", "d", "v"
            ).collect(),
        )
    )
    assert a == b


def test_anomaly_days_flags_exact_integer_zscore(spark):
    """Hand-built series: 30 flat days then a spike. The spike must
    flag; the flat days must not (zero variance + zero deviation);
    a mild wiggle within 3 sigma must not. Baseline EXCLUDES the
    current day."""
    import datetime as dt

    from sparkstreaming_realtime_spark.operators.timeseries import (
        anomaly_days,
    )

    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), 1000) for i in range(30)]
    rows[29] = ("a", base + dt.timedelta(days=29), 50_000)  # spike
    # series b: alternating 1000/1010 — within 3 sigma always
    rows += [
        ("b", base + dt.timedelta(days=i), 1000 + 10 * (i % 2))
        for i in range(30)
    ]
    daily = spark.createDataFrame(rows, "k string, d date, v long")
    got = anomaly_days(
        daily, "k", "d", "v", trailing=28, min_baseline=8, z=3
    ).collect()
    assert [(r.k, str(r.d), r.v) for r in got] == [
        ("a", "2024-01-30", 50_000)
    ]
    # the spike's baseline is the 28 flat days before it
    assert got[0].baseline_n == 28 and got[0].baseline_sum == 28_000


def test_anomaly_days_zero_variance_flags_any_deviation(spark):
    import datetime as dt

    from sparkstreaming_realtime_spark.operators.timeseries import (
        anomaly_days,
    )

    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), 500) for i in range(10)]
    rows.append(("a", base + dt.timedelta(days=10), 501))
    daily = spark.createDataFrame(rows, "k string, d date, v long")
    got = anomaly_days(
        daily, "k", "d", "v", trailing=28, min_baseline=8, z=3
    ).collect()
    assert [(r.k, str(r.d)) for r in got] == [("a", "2024-01-11")]
