"""Frequency sketches — count-min heavy hitters with a checkable
accuracy contract.

The reference's serving layer asks "top actors by count" as an ES
terms agg capped at size 10 (``EsTest.scala:128``); exact top-k by
count needs a full groupBy at corpus scale. The count-min sketch
(Cormode & Muthukrishnan 2005; PAPERS.md) answers frequency queries
from ``d·w`` integers — a fixed-size summary that merges across
partitions/batches by cell-wise addition, which is exactly what a
map-side-combinable Spark aggregate is.

Sketch contract (the part worth testing, mirroring the engine's
HLL±5% check in dau_approx_vs_exact):

- estimates never undercount:  est(x) >= true(x)
- overcount is bounded:        est(x) <= true(x) + ceil(e/w · N)
  with probability 1 - (1/e)^d over the hash draw; with the fixed
  md5-family hashes here the bound is checked explicitly per term.

Engine shape at 100 TB: the sketch build is one explode (×d rows per
token occurrence — d is 4, a constant) into a ``groupBy(row, col)``
count whose output is exactly ``d·w`` cells regardless of corpus
size; it partial-aggregates map-side, broadcasts anywhere, and
streams (cell-wise addition is associative+commutative, so the same
aggregate works under watermarked micro-batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.text import tokenize
from ..materialize import materialize

#: defaults: d=4 rows, w=512 columns → overcount ≤ ceil(e/512·N)
#: ≈ 0.53% of stream length, wrong with prob ≤ e^-4 ≈ 1.8% per query.
CM_DEPTH = 4
CM_WIDTH = 512


def count_min_cells(
    items: DataFrame,
    item_col: str = "item",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the sketch: (row, col, c) cell counts, ``depth·width``
    rows total. One explode + one map-side-combinable count."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (hash60(F.col(item_col), salt=r) % width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(rows).alias("rc"))
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def heavy_hitters_check(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimate the exact top-``k`` terms' counts from the sketch and
    report the accuracy contract per term.

    Returns (term, true_count, est_count, overcount, within_bound):
    ``est_count`` = min over rows of the term's cell; ``within_bound``
    pins est ∈ [true, true + ceil(e/w · N)]. The exact top-k here
    plays the candidate set a production pipeline would track with a
    paired heap; the sketch's job is the frequency answer."""
    toks = materialize(
        docs.select(F.explode(tokenize(text_col)).alias("item"))
    )
    cells = materialize(count_min_cells(toks, "item", depth, width))
    # stream length N folds over the d·w cell table (row 0 holds every
    # occurrence exactly once) — no extra corpus pass
    total = cells.filter(F.col("row") == 0).agg(
        F.sum("c").cast("bigint").alias("n")
    )
    top = (
        toks.groupBy("item")
        .agg(F.count("*").cast("bigint").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("item"))
        .limit(k)
    )
    # the top-k candidate terms re-hash to their (row, col) addresses;
    # joining the (tiny, broadcast) candidate set against the d·w-row
    # cell table stays all-small after the one corpus-wide count
    addressed = top.select(
        "item",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (hash60(F.col("item"), salt=r) % width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "true_count", "rc.row", "rc.col")
    est = (
        addressed.join(cells, ["row", "col"])
        .groupBy("item", "true_count")
        .agg(F.min("c").alias("est_count"))
    )
    bound = F.ceil(F.lit(2.718281828459045) / width * F.col("n")).cast("bigint")
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            F.col("item").alias("term"),
            "true_count",
            "est_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
            (
                (F.col("est_count") >= F.col("true_count"))
                & (F.col("est_count") <= F.col("true_count") + bound)
            )
            .cast("int")
            .alias("within_bound"),
        )
    )
