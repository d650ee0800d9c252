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

from pyspark.sql import DataFrame, Window
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


def key_skew_profile(
    df: DataFrame | None,
    key_col: str,
    k: int = 10,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Join-key skew diagnostic: the report to read BEFORE keying a
    100 TB shuffle on ``key_col`` — whether to salt, which keys to
    isolate, how lopsided the partition load will be. Returns the
    top-``k`` heaviest keys as (rank, key, n, share, cum_share) plus
    the distribution constants (n_keys, n_rows, gini) repeated per
    row (one frame, one oracle).

    The Gini coefficient over per-key counts is computed EXACTLY in
    integers without ever globally sorting the keys: sorting is only
    needed for Σ rank·count, and keys with EQUAL counts occupy a
    consecutive rank run whose contribution is count · (run-sum of
    ranks) regardless of order within the run — so the profile
    aggregates the count HISTOGRAM (count value → #keys, a domain of
    at most O(√n_rows) distinct values) and walks THAT with one tiny
    single-partition window, never a corpus-wide one. gini =
    (2·S − (K+1)·T) / (K·T) with S = Σ rank·count — one fixed-order
    double division of exact int64s, rounded 6dp (0 = uniform,
    → 1 = one key owns everything).

    Scale shape: one map-side-combinable key count (the same shuffle
    the candidate join would do, at count width), one histogram
    aggregate over it, a ≤-O(√N)-row window, and a TakeOrdered for
    the top-k. ``share``/``cum_share`` are 6dp divisions of exact
    counts; cum_share ties break by key ascending so the k-row
    window is deterministic."""
    from ..materialize import materialize

    # `counts` lets a streaming maintainer hand in pre-merged (key, n)
    # rows (streaming/sinks.py:rollup_sum_sink state — per-key counts
    # are additive over ANY row split, no atomicity contract needed);
    # the histogram/Gini/top-k below are identical either way, so the
    # served profile hash-equals the one-shot batch profile. Exactly
    # one input source: both/neither would otherwise fail deep in the
    # plan builder with an opaque AttributeError.
    if (df is None) == (counts is None):
        raise ValueError(
            "key_skew_profile needs exactly one of df or counts"
        )
    counts = materialize(
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        if counts is None
        else counts.select("key", F.col("n").cast("bigint").alias("n"))
    )
    # histogram of counts: c -> (#keys with that count, c * #keys)
    hist = counts.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("__m")
    )
    w = Window.orderBy("n")
    # rank run for count value c: [prev_keys + 1, prev_keys + m];
    # sum of ranks in the run = m * (2*prev + m + 1) / 2  (exact:
    # m*(...) is always even times /2 -> use integral arithmetic)
    runs = hist.select(
        "n",
        "__m",
        (F.sum("__m").over(w) - F.col("__m")).alias("__prev"),
    )
    s_terms = runs.select(
        (
            F.col("n")
            * F.col("__m")
            * (2 * F.col("__prev") + F.col("__m") + 1)
        ).alias("__s2"),  # 2 * (c * run-rank-sum), stays integral
        (F.col("n") * F.col("__m")).alias("__t"),
        F.col("__m"),
    )
    stats = s_terms.agg(
        F.sum("__s2").cast("bigint").alias("__S2"),  # = 2*S
        F.sum("__t").cast("bigint").alias("__T"),
        F.sum("__m").cast("bigint").alias("__K"),
    ).select(
        F.col("__K").alias("n_keys"),
        F.col("__T").alias("n_rows"),
        F.round(
            (F.col("__S2") - (F.col("__K") + 1) * F.col("__T")).cast(
                "double"
            )
            / (F.col("__K") * F.col("__T")).cast("double"),
            6,
        ).alias("gini"),
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(k)
    wk = Window.orderBy(F.desc("n"), F.asc("key"))
    # attach totals AFTER the limit: broadcast the 1-row stats frame
    ranked = top.crossJoin(F.broadcast(stats)).select(
        F.row_number().over(wk).alias("rank"),
        "key",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("share"),
        F.round(
            F.sum("n").over(wk).cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("cum_share"),
        "n_keys",
        "n_rows",
        "gini",
    )
    return ranked
