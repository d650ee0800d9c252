"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus run needs samples that are (a) reproducible across
reruns and engines (no ``rand()`` — a retry must pick the same rows),
(b) per-stratum tunable (downsample the majority language, keep the
tail), and (c) computable in a single scan with no shuffle. Hashing a
stable key and thresholding does all three: row selection becomes a
pure filter that Catalyst pushes into the scan, and the achieved rate
concentrates tightly around the target (Chernoff) at any scale.

The reference has no sampling surface at all; this is part of the
LLM-pipeline extension family (like ``doc_hash_split``, which handles
uniform train/val/test splits — this handles *per-stratum rates*).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, oracle_hash60_sql

#: Threshold denominator: rates are resolved to parts-per-million, so
#: engine-portable integer comparison decides membership (no float).
SCALE = 1_000_000


def _thresholds(rates: dict[str, float]) -> dict[str, int]:
    return {k: int(math.floor(v * SCALE)) for k, v in rates.items()}


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash60(key) mod SCALE < rate(stratum)·SCALE.

    One scan, zero shuffles: the stratum→threshold map is a literal
    CASE expression, and the hash-threshold predicate filters at the
    source. Strata absent from ``rates`` fall back to
    ``default_rate`` (0 ⇒ dropped)."""
    th = _thresholds(rates)
    cond: Column = F.lit(int(default_rate * SCALE))
    expr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in th.items() for x in kv]
            ),
            F.col(strata_col),
        ),
        cond,
    )
    bucket = hash60(F.col(key_col).cast("string")) % SCALE
    return df.filter(bucket < expr)


def oracle_stratified_sample_sql(
    strata_col: str, rates: dict[str, float], key_col: str, default_rate: float = 0.0
) -> str:
    """DuckDB WHERE-clause reproducing :func:`stratified_sample`."""
    th = _thresholds(rates)
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in th.items())
    case = f"CASE {strata_col} {whens} ELSE {int(default_rate * SCALE)} END"
    return f"({oracle_hash60_sql(f'{key_col}::VARCHAR')} % {SCALE}) < {case}"


#: salt for the training-export shuffle hash — distinct from every
#: other hash family in the engine so export order is independent of
#: split/sample membership decisions.
SHUFFLE_PREFIX = "shuf:"


def shuffle_sharded(
    df: DataFrame,
    n_shards: int,
    key_col: str,
) -> DataFrame:
    """Deterministic global pseudo-shuffle + sharding — the last step
    of a training-data pipeline: the corpus must reach the trainer in
    a reproducible random-looking order, cut into equal-ish shards.

    ``h = hash60('shuf:' || key)`` drives both decisions: shard =
    h mod n_shards, order within shard = ascending h. No ``rand()``
    (a retry reproduces the same layout bit-for-bit), no global sort
    (ordering is only ever needed *within* a shard), and shard sizes
    concentrate tightly around N/n_shards. Adds ``shard`` and ``h``
    columns; see :func:`write_training_shards` for the physical
    layout."""
    h = hash60(F.concat(F.lit(SHUFFLE_PREFIX), F.col(key_col).cast("string")))
    return df.withColumn("h", h).withColumn(
        "shard", (F.col("h") % n_shards).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
) -> None:
    """Materialize the shuffled corpus as one directory per shard,
    rows h-ordered within each: ONE hash-partitioned shuffle into
    exactly ``n_shards`` tasks, an in-partition sort (no global
    ordering barrier), then a partitionBy(shard) write — each shard's
    files read back in trainer order. At 100 TB each shard is a few
    hundred GB of sequentially-readable parquet; readers stream
    shards independently."""
    out = shuffle_sharded(df, n_shards, key_col)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


#: pre-filter sizing for exact_k_sample: keep the ~``margin·k`` (at
#: least ``floor``) smallest-hash rows per stratum before the rank
#: window. P(the true k-th smallest hash is filtered out) =
#: P(Binomial(n, target/n) < k) ≤ exp(-(target-k)²/2·target)
#: (Chernoff) — below 1e-40 at the defaults for any k ≤ 64, and
#: deterministic for a fixed dataset (hashes are content-derived, so
#: an oracle run either always agrees or always disagrees — pinned
#: by test_exact_k_prefilter_matches_unfiltered).
EXACT_K_MARGIN = 4
EXACT_K_FLOOR = 256
_HASH_SPACE = 1 << 60


def exact_k_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    prefilter: bool = True,
) -> DataFrame:
    """Exactly-``k`` rows per stratum (or all, when the stratum is
    smaller), deterministic: rows rank by ``hash60(key)`` within
    their stratum and the first ``k`` win. The quota counterpart of
    :func:`stratified_sample`'s rates — "cap every source at k docs"
    — with hash order standing in for a random order, so membership
    is stable across runs/engines and composes with hash splits.

    **Skew safety is built in**: a 10-billion-row stratum must never
    be globally sorted to take k rows. Before the rank window, a
    hash-threshold pre-filter keeps only rows with
    ``hash60(key) < 2^60 · target/|stratum|`` (``target`` =
    max(4k, 256)); because the filter cuts a PREFIX of the exact
    rank order, the surviving ~target rows per stratum provably
    contain the true top-k (failure bound in :data:`EXACT_K_MARGIN`'s
    note). Per-stratum sizes come from one narrow count aggregate
    broadcast back onto the scan, so the plan is: cheap count →
    pushdown-friendly filter → window over ~target rows per stratum.
    ``prefilter=False`` restores the plain window (used by tests to
    prove equivalence)."""
    from pyspark.sql import Window

    rank_key = hash60(F.col(key_col).cast("string"))
    base = df
    if prefilter:
        target = float(max(EXACT_K_MARGIN * k, EXACT_K_FLOOR))
        counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
        cutoff = (
            F.when(F.col("__n") <= target, F.lit(_HASH_SPACE))
            .otherwise(
                (F.lit(float(_HASH_SPACE)) * target / F.col("__n"))
                .cast("bigint")
            )
            .alias("__cut")
        )
        # eqNullSafe, not an equi-join on the column name: a NULL
        # stratum is a real window partition (up to k rows of it come
        # back), so the pre-filter must not silently drop those rows.
        base = (
            df.join(
                F.broadcast(
                    counts.select(
                        F.col(strata_col).alias("__strat"), cutoff
                    )
                ),
                F.col(strata_col).eqNullSafe(F.col("__strat")),
            )
            .filter(rank_key < F.col("__cut"))
            .select(*df.columns)  # restore caller column order
        )
    w = Window.partitionBy(strata_col).orderBy(
        rank_key.asc(), F.col(key_col).asc()
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_label(key_col, prefix: str):
    """The engine's standard hash-bucket split label (10% test, 10%
    holdout, 80% train) for any stable string key — factored out of
    the doc_hash_split convention so GROUP-level splits (key = the
    leakage unit: source/domain/url-prefix) use the identical
    arithmetic. Membership depends only on (prefix, key): re-runs,
    corpus versions, and engines agree."""
    from pyspark.sql import functions as F

    from ..functions.hashing import hash60

    bucket = hash60(F.concat(F.lit(prefix), key_col.cast("string"))) % 100
    return (
        F.when(bucket < 10, "test")
        .when(bucket < 20, "holdout")
        .otherwise("train")
    )


def split_leakage_report(
    docs,
    pairs,
    policies: dict,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
):
    """Audit how many NEAR-DUP pairs a split policy separates across
    split boundaries — the contamination a per-document split invites
    (a near-duplicate of a training doc landing in test inflates
    eval; the published mitigation is splitting by the leakage UNIT —
    domain/source — so correlated documents travel together).

    ``policies`` maps policy name → a split-label Column over the
    docs frame (e.g. from :func:`split_label` on doc_id vs source).
    Returns (policy, n_pairs, n_cross, cross_pct): total verified
    near-dup pairs, pairs whose endpoints landed in different splits,
    and the crossing rate at 4dp — a MEASUREMENT, not a guarantee:
    if dups cluster inside groups, the group policy's n_cross drops
    to 0; if they don't, the audit says so honestly.

    Scale shape: the pair frame is the dedup pipeline's existing
    candidate output (never all-pairs); each policy costs two
    id-keyed joins of labels onto it plus one tiny aggregate."""
    from pyspark.sql import functions as F

    if not policies:
        raise ValueError("policies must be non-empty")
    out = None
    for name, label in policies.items():
        lab = docs.select(
            F.col(id_col).alias("__id"), label.alias("__split")
        )
        a = lab.select(
            F.col("__id").alias(pair_a), F.col("__split").alias("__sa")
        )
        b = lab.select(
            F.col("__id").alias(pair_b), F.col("__split").alias("__sb")
        )
        joined = pairs.join(a, pair_a).join(b, pair_b)
        agg = joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("__sa") != F.col("__sb")).cast("bigint")
            ).alias("n_cross"),
        ).select(
            F.lit(name).alias("policy"),
            "n_pairs",
            F.coalesce(F.col("n_cross"), F.lit(0))
            .cast("bigint")
            .alias("n_cross"),
            F.round(
                F.coalesce(F.col("n_cross"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_pairs"), F.lit(1)).cast("double"),
                4,
            ).alias("cross_pct"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("policy")
