"""N-gram language-model perplexity filtering (CCNet-style).

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", PAPERS.md) rank crawl documents by
their perplexity under a language model trained on a high-quality
target corpus, then keep the low-perplexity head/middle. The same
signal here with a bigram model the engines can reproduce exactly:

    p(w2 | w1) = (c2(w1 w2) + 1) / (c1(w1) + V)       (add-1 smoothing)

with ``c2``/``c1`` counts over the TARGET documents only and ``V``
the target's distinct-unigram vocabulary size. A document's score is
its mean per-bigram log-probability (≈ −log perplexity): higher =
more target-like.

Engine shape at 100 TB:

- Model "training" is two counting aggregates over the target's
  exploded tokens/bigrams — map-side combinable, one shuffle each,
  output scales with target vocabulary (not corpus size).
- Per-(w1,w2) log-probs are quantized to integer **micro-nats** on
  the model table (small), so per-document totals are exact integer
  sums — order-independent, bit-identical across engines (the same
  fixed-point move as ``operators/importance.py``).
- Scoring joins the corpus' exploded bigrams to the bigram table and
  unigram table by token hash — narrow 8-byte keys, plain shuffle
  hash joins that AQE can re-plan; nothing broadcasts that grows
  with data size, nothing collects.

Documents with fewer than 2 tokens have no bigrams and are not
scored (CCNet drops them to a separate bucket; callers can anti-join
to find them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.text import ngram_shingles, tokenize
from ..materialize import materialize


def _doc_bigrams(
    docs: DataFrame, text_col: str, id_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, carry..., w1_hash, bg_hash) — one row per bigram
    occurrence; docs with <2 tokens contribute nothing. Hashing both
    keys once here keeps every downstream join key 8 bytes."""
    toks = tokenize(text_col)
    return (
        docs.filter(F.size(toks) >= 2)
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.explode(ngram_shingles(F.col(text_col), 2)).alias("__bg"),
        )
        .select(
            id_col,
            *carry,
            hash60(F.substring_index(F.col("__bg"), " ", 1)).alias("w1h"),
            hash60(F.col("__bg")).alias("bgh"),
        )
    )


def lm_score(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document by mean bigram log-probability under the
    add-1 bigram model of the ``target_pred`` documents.

    Returns (doc_id, n_bigrams, logprob_micro, mean_logprob):
    ``logprob_micro`` is the exact integer micro-nat total;
    ``mean_logprob`` divides it back to nats (rounded 4dp) — the
    CCNet ranking key (negate for perplexity ordering)."""
    bg = materialize(
        _doc_bigrams(
            docs.withColumn("__is_target", target_pred),
            text_col,
            id_col,
            carry=("__is_target",),
        )
    )
    target = bg.filter(F.col("__is_target"))
    # ONE corpus-side shuffle: the (w1, bigram) count. The unigram
    # table and the vocabulary size both derive from it — c1(w1) =
    # Σ_bg c2 and V = |c1| — as vocab-sized re-aggregations, so the
    # corpus never shuffles for them (was 3 corpus-wide shuffles).
    c2 = materialize(
        target.groupBy("w1h", "bgh").agg(F.count("*").alias("c2"))
    )
    c1 = c2.groupBy("w1h").agg(F.sum("c2").alias("c1"))
    # V = distinct conditioning unigrams of the target = rows of c1;
    # bigram w1's are every target token except each doc's last — the
    # standard conditioning-vocabulary choice, consistent between
    # engines by construction.
    v = c1.agg(F.count("*").cast("double").alias("v"))
    model = (
        c2.join(c1, "w1h")
        .crossJoin(F.broadcast(v))
        .select(
            "bgh",
            F.round(
                1e6 * (F.log(F.col("c2") + 1.0) - F.log(F.col("c1") + F.col("v")))
            )
            .cast("bigint")
            .alias("llp"),
        )
    )
    # unseen-bigram fallback per w1: log(1 / (c1 + V)); w1 unseen in
    # the target collapses to log(1 / V)
    fallback = c1.crossJoin(F.broadcast(v)).select(
        "w1h",
        F.round(-1e6 * F.log(F.col("c1") + F.col("v")))
        .cast("bigint")
        .alias("llp_w1"),
    )
    unseen = F.round(-1e6 * F.log(F.col("v"))).cast("bigint")
    scored = (
        bg.join(model, "bgh", "left")
        .join(fallback, "w1h", "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            F.coalesce(
                F.col("llp"), F.col("llp_w1"), unseen
            ).alias("__llp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("__llp").cast("bigint").alias("logprob_micro"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "logprob_micro",
        F.round(
            F.col("logprob_micro") / F.col("n_bigrams") / 1e6, 4
        ).alias("mean_logprob"),
    )
