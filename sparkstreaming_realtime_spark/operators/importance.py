"""Data-selection importance weighting (DSIR-style).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", PAPERS.md) select pretraining data by importance weight
under two *hashed n-gram* bag-of-words models: a target distribution
(the high-quality corpus you want more of) and the raw distribution
(everything). Each document's log importance weight is the sum over
its tokens of ``log p_target(bucket) - log p_raw(bucket)`` where
``bucket = hash(token) % B`` — a fixed B-bucket feature space that
never grows with vocabulary, which is what makes the method run at
web scale.

Engine shape (the 100 TB story):

- The two bucket-count tables are ONE pass over the exploded tokens
  with map-side combine, producing ``B`` rows each — trivially
  broadcastable no matter the corpus size.
- Per-bucket log-ratios are quantized to integer **micro-nats**
  (``round(1e6 · llr)``) so the per-document score is an exact
  integer sum — order-independent, therefore bit-identical between
  Spark's parallel aggregation and DuckDB's sequential one (the same
  fixed-point trick as the money aggregates in plans/queries.py).
- Scoring is a broadcast join of the B-row feature table onto the
  exploded tokens plus one doc-keyed sum with partial aggregation.

No model training, no Python in the hot path, two small shuffles
(bucket counts, per-doc sum) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.text import tokenize
from ..materialize import materialize

#: hashed feature-space size. DSIR uses 10k buckets for unigram+bigram
#: features; 256 keeps the oracle SQL tractable while exercising the
#: identical plan (the bucket table is broadcast either way).
N_BUCKETS = 256


def hashed_token_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Explode docs to (id, carry..., bucket) — one row per token
    occurrence, bucket = hash60(token) % n_buckets (non-negative, so
    ``%`` agrees between engines)."""
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(tokenize(text_col)).alias("__tok"),
    ).select(
        id_col,
        *carry,
        (hash60(F.col("__tok")) % n_buckets).alias("bucket"),
    )


def importance_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    keep_quantile: float = 0.75,
) -> DataFrame:
    """Score every document by its DSIR log importance weight and
    flag the top ``1 - keep_quantile`` fraction for keeping.

    ``target_pred`` is a boolean Column defining the target
    distribution's documents (e.g. ``F.col("lang") == "en"``); both
    bucket models use add-1 smoothing so empty buckets stay finite:
    ``p(b) = (count_b + 1) / (total + B)``.

    Returns (doc_id, score_micro, keep): ``score_micro`` is the exact
    integer micro-nat log weight, ``keep`` compares it against the
    corpus-wide ``keep_quantile`` exact percentile (broadcast
    scalar)."""
    toks = materialize(
        hashed_token_buckets(
            docs.withColumn("__is_target", target_pred),
            text_col,
            id_col,
            n_buckets,
            carry=("__is_target",),
        )
    )
    counts = materialize(
        toks.groupBy("bucket").agg(
            F.count("*").alias("cr"),
            F.sum(F.col("__is_target").cast("bigint")).alias("ct"),
        )
    )
    # totals fold over the B-row bucket table, not the corpus — the
    # exploded tokens are scanned exactly once (the counts aggregate)
    totals = counts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    b = F.lit(float(n_buckets))
    llr_micro = F.round(
        1e6
        * (
            F.log(F.col("ct") + 1.0)
            - F.log(F.col("tt") + b)
            - F.log(F.col("cr") + 1.0)
            + F.log(F.col("tr") + b)
        )
    ).cast("bigint")
    feats = (
        counts.crossJoin(F.broadcast(totals))
        .select("bucket", llr_micro.alias("llr"))
    )
    scores = materialize(
        toks.join(F.broadcast(feats), "bucket")
        .groupBy(id_col)
        .agg(F.sum("llr").cast("bigint").alias("score_micro"))
    )
    thr = scores.agg(
        F.expr(f"percentile(score_micro, {keep_quantile})").alias("__thr")
    )
    return scores.crossJoin(F.broadcast(thr)).select(
        id_col,
        "score_micro",
        (F.col("score_micro") >= F.col("__thr")).cast("int").alias("keep"),
    )
