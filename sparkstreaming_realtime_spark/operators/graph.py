"""Iterative graph algorithms beyond connected components: PageRank
with engine-portable integer arithmetic.

The reference's serving layer ranks hot actors with a terms
aggregation (EsTest.scala:128 — top-k by doc count); PageRank is the
graph-native form of "which entities matter", and for the engine it
doubles as the showcase of a NUMERIC iterative DataFrame loop (the
dedup family's connected_components is the SET-valued one).

Determinism is the hard part, solved the same way as money_sum /
lm.py's micro-nats: **all rank mass is integer micro-units**, so
every aggregation is a bigint sum — order-independent under any
partitioning — and both engines (Spark `div`, DuckDB `//`, both
truncating) compute bit-identical iterates. Double-precision
PageRank would hash-diverge across engines from float summation
order alone.

Per iteration (damping d = 85/100, teleport mass 150 000 of the
1 000 000-unit start):

    r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div out_deg(u))) div 100

Scale shape: one shuffle per iteration (the contribution groupBy);
the rank and degree frames are node-keyed and re-partition
consistently; `materialize(eager=True)` cuts lineage each round so
plan re-analysis stays flat (the connected_components lesson —
persist-only loops go exponential past ~5 rounds). The iteration
count is FIXED (an analytics rollup, not convergence detection), so
the oracle replays it as a chain of CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: integer micro-rank constants shared with the SQL oracle: start
#: mass per node, teleport term, damping numerator/denominator
PR_START = 1_000_000
PR_TELEPORT = 150_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    dedup_edges: bool = True,
) -> DataFrame:
    """Integer-arithmetic PageRank over a directed edge list.

    ``edges`` must cover every node as a source at least once
    (callers with dangling nodes add reverse edges or self-loops
    first — the registry query feeds a bidirectional edge set, where
    out-degree ≥ 1 holds by construction). Returns (node,
    rank_micro): bigint micro-units, bit-identical across engines.
    """
    from ..materialize import ensure_checkpoint_dir, materialize

    ensure_checkpoint_dir(edges.sparkSession)
    # pre-partition the (deduped) edge list by join key BEFORE the
    # checkpoint: every iteration joins on __src, and a checkpointed
    # frame keeps its partitioning, so the three per-iteration joins
    # reuse this one exchange instead of re-shuffling the full edge
    # list each round (the edge list is the big side — 120M rows at
    # the ×100 probe; ranks is |nodes|, ~1% of it)
    e = edges.select(
        F.col(src).cast("long").alias("__src"),
        F.col(dst).cast("long").alias("__dst"),
    )
    if dedup_edges:
        # callers whose edge list is distinct BY CONSTRUCTION (e.g. a
        # union of two direction-disjoint distinct sets) pass
        # dedup_edges=False and skip a full edge-list shuffle — at the
        # ×100 probe that is a 100M-row dedup avoided
        e = e.distinct()
    e = materialize(e.repartition(F.col("__src")))
    deg = materialize(
        e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    )
    # carry out-degree INSIDE the rank frame: one edges⋈ranks join
    # per iteration instead of edges⋈ranks⋈deg — the re-attach join
    # after each aggregate is node-keyed (tiny side), never the edges
    rd = deg.select(
        F.col("__src").alias("node"),
        F.lit(PR_START).cast("long").alias("rank_micro"),
        F.col("__deg"),
    )
    for _ in range(iters):
        contribs = e.join(rd, e["__src"] == rd["node"]).select(
            F.col("__dst").alias("node"),
            F.expr("rank_micro div __deg").alias("__c"),
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(PR_TELEPORT)
                + F.expr(f"({PR_DAMP_NUM} * sum(__c)) div {PR_DAMP_DEN}")
            ).cast("long").alias("rank_micro")
        )
        rd = materialize(
            ranks.join(
                deg.select(F.col("__src").alias("node"), "__deg"), "node"
            ),
            eager=True,
        )
    return rd.select("node", "rank_micro")
