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


def exact_k_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
) -> DataFrame:
    """Exactly-``k`` rows per stratum (or all, when the stratum is
    smaller), deterministic: rows rank by ``hash60(key)`` within
    their stratum and the first ``k`` win. The quota counterpart of
    :func:`stratified_sample`'s rates — "cap every source at k docs"
    — with hash order standing in for a random order, so membership
    is stable across runs/engines and composes with hash splits.

    Cost: ONE shuffle keyed by stratum for the rank window. Stratum
    skew is real at 100 TB (one source can be half the corpus); the
    mitigation is a pre-filter with :func:`stratified_sample` at a
    rate that overshoots k (hash-threshold, zero shuffle) so the
    window only ranks ~k·ε rows per stratum — the two ops compose
    exactly because both order by the SAME hash."""
    from pyspark.sql import Window

    rank_key = hash60(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(
        rank_key.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
