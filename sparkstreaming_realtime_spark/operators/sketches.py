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


# --- KMV distinct-count sketch (k minimum values) --------------------

#: sketch size: k smallest distinct hash values. Relative std error
#: ≈ 1/sqrt(k−2) ≈ 6.3% at 256; the state is 256 bigints, mergeable
#: by union → re-take k smallest.
KMV_K = 256
#: hash60's range — the order-statistics normalizer.
HASH_SPACE = 1 << 60


def kmv_sketch(
    items: DataFrame,
    item_col: str = "item",
    k: int = KMV_K,
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.
    2002; Beyer et al. 2007 "On synopses for distinct-value
    estimation"): the ``k`` smallest DISTINCT hash60 values of the
    item stream, as a ≤ k-row frame (h). Duplicates of an item hash
    identically, so the sketch sees the distinct set by
    construction; 60-bit hashing makes cross-item collisions
    negligible (n²/2^61).

    Unlike Spark's approx_count_distinct (HLL± registers, opaque and
    engine-specific), the KMV state is EXACT integers both engines
    reproduce bit-for-bit — the DuckDB oracle rebuilds the very same
    k values — and it merges by union → re-take k smallest (min-like:
    idempotent, associative, commutative), so per-batch sketches over
    ANY batch split merge to the one-shot corpus sketch exactly
    (streaming/sinks.py:kmv_sink).

    Engine shape at 100 TB: the md5 hash is one narrow JVM-side
    projection; a ``dense_rank ≤ k`` window partitioned by
    ``spark_partition_id()`` prunes each partition to its k smallest
    distinct values with ZERO exchange (one in-partition sort), so
    the only shuffle carries ≤ k · n_partitions rows into the final
    distinct + TakeOrdered — never O(corpus distinct)."""
    from pyspark.sql import Window

    hashed = items.select(hash60(F.col(item_col)).alias("h"))
    w = Window.partitionBy(F.spark_partition_id()).orderBy("h")
    pruned = (
        hashed.withColumn("__r", F.dense_rank().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    return pruned.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Fold a KMV sketch to its cardinality estimate (one row,
    ``est_distinct``).

    With U_(k) the k-th smallest of n distinct uniform hashes,
    n̂ = (k−1)/U_(k) = (k−1)·2^60 / h_(k) — the unbiased KMV
    estimator (Beyer et al. 2007 §3). Fewer than k distinct values
    means the sketch IS the distinct set, so the count is returned
    exactly — no small-range bias regime at all. The only float op
    is one fixed-order division of exact integers ((k−1)·2^60 has
    ≤ 53 significant bits for k ≤ 2^44, exact as a double), so the
    estimate is bit-identical across engines."""
    agg = sketch.agg(
        F.count("*").cast("bigint").alias("__b"),
        F.max("h").alias("__hk"),
    )
    numer = float((k - 1) * HASH_SPACE)
    return agg.select(
        F.when(F.col("__b") < k, F.col("__b"))
        .otherwise(
            F.round(F.lit(numer) / F.col("__hk").cast("double")).cast(
                "bigint"
            )
        )
        .alias("est_distinct")
    )


def kmv_overlap(
    items_a: DataFrame,
    items_b: DataFrame,
    item_col: str = "item",
    k: int = KMV_K,
) -> DataFrame:
    """Jaccard overlap between two item streams from their KMV
    sketches (Beyer et al. 2007 §5, the set-algebra payoff of the
    k-minimum-values state): with A_k, B_k the per-corpus sketches
    and M the k smallest of A_k ∪ B_k (itself the sketch of A ∪ B —
    closure under union is the KMV property),

        Ĵ = |M ∩ A_k ∩ B_k| / |M|

    — each of M's values is a uniform sample of A ∪ B, and it lies in
    both A and B exactly when it's in both sketches (a top-|M| hash
    of the union is top-k in each side it belongs to). When the union
    has fewer than k distinct values, M IS the union and the answer
    is exact — same no-small-range-bias property as kmv_estimate.

    Everything after the two corpus scans is ≤ 2k integers: the
    membership joins and counts are sketch-sized. One row out:
    (k_used, inter_in_topk, jaccard_est)."""
    a = kmv_sketch(items_a, item_col, k)
    b = kmv_sketch(items_b, item_col, k)
    m = a.unionByName(b).distinct().orderBy("h").limit(k)
    flagged = m.join(
        F.broadcast(a.withColumn("__ina", F.lit(1))), "h", "left"
    ).join(F.broadcast(b.withColumn("__inb", F.lit(1))), "h", "left")
    return flagged.agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.sum(
            (
                F.col("__ina").isNotNull() & F.col("__inb").isNotNull()
            ).cast("int")
        )
        .cast("bigint")
        .alias("inter_in_topk"),
    ).select(
        "k_used",
        "inter_in_topk",
        F.round(
            F.col("inter_in_topk").cast("double")
            / F.col("k_used").cast("double"),
            4,
        ).alias("jaccard_est"),
    )


def kmv_sketch_grouped(
    items: DataFrame,
    group_col: str,
    item_col: str = "item",
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV sketches in ONE pass: the k smallest distinct
    hash60 values for every group, as a (group, h) frame with ≤ k
    rows per group — the sketch as a GROUPED aggregate, so "distinct
    items per language / per source / per shard" costs one scan
    regardless of group count.

    Same map-side shape as :func:`kmv_sketch` with the group key
    joined into the window partition: dense_rank ≤ k per
    (input partition, group) plans as a partial WindowGroupLimit, so
    the shuffle carries ≤ k rows per (partition, group); the final
    per-group top-k is a row_number over the ≤ k·n_partitions
    surviving rows per group."""
    from pyspark.sql import Window

    hashed = items.select(
        F.col(group_col), hash60(F.col(item_col)).alias("h")
    )
    pre = Window.partitionBy(
        F.spark_partition_id(), group_col
    ).orderBy("h")
    pruned = (
        hashed.withColumn("__r", F.dense_rank().over(pre))
        .filter(F.col("__r") <= k)
        .drop("__r")
        .distinct()
    )
    final = Window.partitionBy(group_col).orderBy("h")
    return (
        pruned.withColumn("__r", F.row_number().over(final))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_estimate_grouped(
    sketch: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group cardinality estimates from a grouped KMV sketch —
    one row per group (group, est_distinct), same estimator and
    exact-below-k contract as :func:`kmv_estimate`."""
    numer = float((k - 1) * HASH_SPACE)
    agg = sketch.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("__b"),
        F.max("h").alias("__hk"),
    )
    return agg.select(
        F.col(group_col),
        F.when(F.col("__b") < k, F.col("__b"))
        .otherwise(
            F.round(F.lit(numer) / F.col("__hk").cast("double")).cast(
                "bigint"
            )
        )
        .alias("est_distinct"),
    )


#: DDSketch default relative accuracy (Masson, Lee & Rola, VLDB 2019,
#: "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
#: Relative-Error Guarantees") — gamma = (1+α)/(1-α)
DD_ALPHA = 0.01


def _dd_ln_gamma(alpha: float) -> float:
    import math

    return math.log((1.0 + alpha) / (1.0 - alpha))


def dd_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """DDSketch bucket counts per group: the QUANTILE member of the
    sketch family (count-min = heavy hitters, KMV = distinct count,
    this = percentiles). Bucket index ``ceil(ln v / ln γ)`` puts every
    positive value in a bucket whose midpoint estimate is within
    relative error α of the value — and the sketch is just (group,
    bucket, n) integer counts, so it is FULLY MERGEABLE by key-wise
    addition: partial aggregation map-side, cross-partition merges,
    and micro-batch merges (streaming/sinks.py:rollup_sum_sink) all
    compose exactly, unlike exact percentile's per-group sort. Bucket
    count is ~log_γ(max/min) (≈540 for this table's 0.01..490 at
    α=0.01) regardless of row count — the sketch for 100 TB of values
    is a few KB per group.

    Values must be > 0 (the classic DDSketch positive store; callers
    with zeros/negatives shift or store signs separately). The
    ln-γ divisor is passed as one double literal derived from α, so
    the SQL oracle bakes the bit-identical constant."""
    b = F.ceil(
        F.log(F.col(value_col)) / F.lit(_dd_ln_gamma(alpha))
    ).cast("bigint")
    return (
        df.groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def dd_quantiles(
    sketch: DataFrame,
    qs: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Quantile estimates from a :func:`dd_sketch` frame. For each
    ``q``: rank = floor(q·(n−1)) + 1 (1-based, the paper's
    convention), answer = the smallest bucket whose running count
    reaches the rank, estimate = 2·γ^bucket/(γ+1) rounded 6dp —
    within relative error α of the true quantile by construction.

    All selection arithmetic is integer (ranks, cumulative counts);
    the only floats are the final per-bucket midpoint (one pow) and
    the baked ln-γ. The running-count window partitions by group over
    ~log_γ(max/min) bucket rows — sketch-sized, never row-sized."""
    from pyspark.sql import Window

    gamma = (1.0 + alpha) / (1.0 - alpha)
    w = Window.partitionBy(
        *[F.col(c) for c in group_cols]
    ).orderBy("bucket")
    cum = sketch.select(
        *group_cols,
        "bucket",
        F.sum("n").over(w).alias("__cum"),
        F.sum("n").over(
            Window.partitionBy(*[F.col(c) for c in group_cols])
        ).alias("__total"),
    )
    qf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hits = cum.crossJoin(F.broadcast(qf)).filter(
        F.col("__cum")
        >= F.floor(F.col("q") * (F.col("__total") - 1)) + 1
    )
    best = hits.groupBy(*group_cols, "q").agg(
        F.min("bucket").alias("__b"), F.max("__total").alias("n_rows")
    )
    est = F.round(
        F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("__b"))
        / F.lit(gamma + 1.0),
        6,
    )
    return best.select(
        *group_cols, "q", est.alias("est"), "n_rows"
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Sketch-driven robust scaling: per-group winsorized statistics
    with the clip bounds taken from the :func:`dd_sketch` quantile
    estimates — the feature-engineering normalization a training
    pipeline applies to heavy-tailed numeric columns (clip at
    p01/p99, THEN average), without ever sorting the corpus.

    Two scans total at ANY size: one to build the (group, bucket, n)
    sketch, one to clip-and-aggregate with the ≤|groups|·2 bounds
    broadcast back — vs the exact approach's per-group full sort.
    Because the sketch and its quantile read are deterministic and
    engine-replayable, the clip bounds — and therefore every
    winsorized value — are bit-identical across engines: the clipped
    mean is exact integer cents divided once at 4dp.

    Returns (group..., n, lo, hi, win_sum_cents, win_mean)."""
    sk = dd_sketch(df, value_col, group_cols=group_cols, alpha=alpha)
    qs = dd_quantiles(sk, (q_lo, q_hi), group_cols=group_cols, alpha=alpha)
    bounds = qs.groupBy(*group_cols).agg(
        F.max(F.when(F.col("q") == q_lo, F.col("est"))).alias("lo"),
        F.max(F.when(F.col("q") == q_hi, F.col("est"))).alias("hi"),
    )
    clipped = df.join(F.broadcast(bounds), list(group_cols)).select(
        *group_cols,
        "lo",
        "hi",
        F.round(
            F.least(
                F.greatest(F.col(value_col), F.col("lo")), F.col("hi")
            )
            * 100
        )
        .cast("bigint")
        .alias("__cents"),
    )
    return clipped.groupBy(*group_cols, "lo", "hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__cents").cast("bigint").alias("win_sum_cents"),
        F.round(
            F.sum("__cents").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100.0,
            4,
        ).alias("win_mean"),
    ).select(*group_cols, "n", "lo", "hi", "win_sum_cents", "win_mean")
