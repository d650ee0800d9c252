"""Declarative data-quality expectations — the pre-training gate.

A 100 TB pipeline run must refuse to train on a broken extract:
nulls where the contract says none, key collisions after a bad
merge, categorical drift, out-of-range measures, truncated loads.
The industry shape for this (Deequ's Check / Great Expectations'
suite) is a list of declarative expectations compiled into ONE pass
over the data; this module is that shape on plain DataFrames:

- every expectation lowers to a conditional aggregate, so the whole
  suite rides in a single ``agg`` with map-side partials (one scan,
  no matter how many checks);
- the verdict comes back as a FRAME (check, metric, threshold,
  passed) — pipelines gate on ``passed`` and warehouses keep the
  history, the same observability contract as ``table_profile``;
- a referential check (``fk``) is the one exception: it needs the
  dim side, and compiles to a broadcast-able anti-join count.

Expectations (tuples, kept engine-portable so the DuckDB oracle can
replay them):

- ``("not_null", col, max_null_fraction)``
- ``("unique", col)`` — no duplicate values among non-null rows
- ``("accepted_values", col, values, min_fraction)``
- ``("between", col, lo, hi)`` — all non-null values in [lo, hi]
- ``("row_count", lo, hi)``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metric(df: DataFrame, spec: tuple) -> tuple[str, Column, float, Column]:
    """(name, metric aggregate, threshold, pass predicate builder
    applied to the metric alias)."""
    kind = spec[0]
    n = F.count(F.lit(1)).cast("double")
    # Zero-row inputs (a routine empty micro-batch): sum() over no
    # rows is NULL and NULL/0 stays NULL, which would make `passed`
    # NULL — an undefined verdict that quarantines empty triggers.
    # Ratio metrics therefore coalesce to their vacuous value (no
    # violations seen / full coverage); only row_count keeps teeth on
    # empty input, which is exactly the check that should.
    if kind == "not_null":
        _, col, max_frac = spec
        name = f"not_null:{col}"
        metric = F.coalesce(
            F.sum(df[col].isNull().cast("bigint")).cast("double") / n,
            F.lit(0.0),
        )
        return name, metric, float(max_frac), None
    if kind == "unique":
        _, col = spec
        name = f"unique:{col}"
        # duplicates among non-null rows: count(col) - count_distinct
        metric = (
            F.count(df[col]) - F.count_distinct(df[col])
        ).cast("double")
        return name, metric, 0.0, None
    if kind == "accepted_values":
        _, col, values, min_frac = spec
        name = f"accepted_values:{col}"
        metric = F.coalesce(
            F.sum(df[col].isin(list(values)).cast("bigint")).cast("double")
            / n,
            F.lit(1.0),  # vacuous full coverage on an empty batch
        )
        return name, metric, float(min_frac), "ge"
    if kind == "between":
        _, col, lo, hi = spec
        name = f"between:{col}"
        bad = ~df[col].between(lo, hi)
        metric = F.coalesce(
            F.sum(
                F.when(df[col].isNotNull() & bad, 1).otherwise(0)
            ).cast("double"),
            F.lit(0.0),
        )
        return name, metric, 0.0, None
    if kind == "row_count":
        _, lo, hi = spec
        name = "row_count"
        metric = F.count(F.lit(1)).cast("double")
        return name, metric, float(lo), ("between", float(lo), float(hi))
    raise ValueError(f"unknown expectation {kind!r}")


def check_expectations(
    df: DataFrame, expectations: list[tuple]
) -> DataFrame:
    """Run the suite in ONE scan; returns (check, metric, threshold,
    passed) — one row per expectation, ``passed`` as int (1/0) for
    engine-portable hashing. Pass direction per kind: violation
    metrics (null fraction, dup count, out-of-range count) must be
    ≤ threshold; coverage metrics (accepted-value fraction) must be
    ≥; row_count must land inside its window."""
    aggs, rows = [], []
    for i, spec in enumerate(expectations):
        name, metric, threshold, mode = _metric(df, spec)
        aggs.append(F.round(metric, 6).alias(f"__m_{i}"))
        rows.append((i, name, threshold, mode))
    one = df.agg(*aggs)
    # verdict columns computed on the single stats row, then
    # unpivoted with stack() — a UNION of per-check selects would
    # re-execute the aggregate (one source scan PER CHECK in the
    # physical plan; Catalyst has no cross-branch agg reuse here),
    # exactly the multi-pass this operator exists to avoid. Same
    # barrier technique as profiling.table_profile.
    for i, name, threshold, mode in rows:
        m = F.col(f"__m_{i}")
        if mode == "ge":
            ok = m >= threshold
        elif isinstance(mode, tuple) and mode[0] == "between":
            ok = m.between(mode[1], mode[2])
        else:
            ok = m <= threshold
        one = one.withColumn(f"__p_{i}", ok.cast("int"))
    stack = F.expr(
        "stack({n}, {args}) AS (check, metric, threshold, passed)".format(
            n=len(rows),
            args=", ".join(
                "'{name}', __m_{i}, CAST({th} AS DOUBLE), __p_{i}".format(
                    name=name.replace("'", "\\'"), i=i, th=float(threshold)
                )
                for i, name, threshold, _ in rows
            ),
        )
    )
    return one.select(stack)


def check_foreign_key(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """Referential integrity as the same verdict frame: count of fact
    rows whose non-null key misses the dim — an anti-join the planner
    broadcasts while the dim side fits (and a shuffled semi-diff
    beyond that), never a driver-side set."""
    orphans = (
        df.filter(F.col(col).isNotNull())
        .join(
            dim.select(F.col(dim_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
    )
    return orphans.select(
        F.lit(f"fk:{col}").alias("check"),
        F.round("metric", 6).alias("metric"),
        F.lit(0.0).alias("threshold"),
        (F.col("metric") <= 0).cast("int").alias("passed"),
    )
