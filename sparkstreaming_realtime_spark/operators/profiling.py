"""Table profiling — the ANALYZE TABLE / data-quality surface.

A pipeline onboarding a new 100 TB source asks the same first
questions every time: how many rows, which columns are nullable in
practice, what are the cardinalities. :func:`table_profile` answers
them in ONE scan:

- every per-column statistic (null count, exact distinct) rides in a
  single ``agg`` — Spark plans the multi-distinct via EXPAND, still
  one pass over the data with map-side partials;
- the single stats row unpivots driver-side into one row per column
  (a few dozen rows — metadata-sized by construction).

Exact distincts are deliberate: this is the oracle-checkable
contract. At 100 TB swap ``exact=False`` to run HLL sketches
(``approx_count_distinct``) instead — same plan shape, bounded
memory — mirroring the dau_approx_vs_exact accuracy trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, exact: bool = True) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) for every column, one
    scan. ``exact=False`` switches distincts to HLL estimates for
    arbitrary-cardinality columns at scale."""
    cols = df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    # positional aliases + df[c] references: a column named
    # 'content-type' or 'a b' (JSON ingests) must not break the
    # generic ANALYZE surface via unquoted identifier interpolation
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            # coalesce: sum over ZERO rows is NULL, but the profile's
            # schema contract is "0 nulls in 0 rows" (count_distinct
            # already yields 0 on empty input)
            F.coalesce(
                F.sum(df[c].isNull().cast("bigint")), F.lit(0)
            ).alias(f"__nulls_{i}")
        )
        aggs.append(distinct(df[c]).alias(f"__nd_{i}"))
    row = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args}) AS (column, n_nulls, n_distinct)".format(
            n=len(cols),
            args=", ".join(
                "'{c}', __nulls_{i}, __nd_{i}".format(
                    c=c.replace("'", "\\'"), i=i
                )
                for i, c in enumerate(cols)
            ),
        )
    )
    return row.select(F.col("__n").alias("n_rows"), stack).select(
        "column",
        F.col("n_rows").cast("bigint"),
        F.col("n_nulls").cast("bigint"),
        F.col("n_distinct").cast("bigint"),
    )
