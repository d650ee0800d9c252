"""Record linkage: blocked fuzzy matching (edit-distance entity
resolution) at corpus scale.

The reference's update-by-query surface (PublishDaoImpl's term/match
queries) finds records by EXACT analyzed terms; a data pipeline that
ingests entity tables (customers, suppliers, user registrations)
also needs the fuzzy form — "these two rows are probably the same
entity" — without an all-pairs O(N²) comparison.

The candidate generator is segment blocking (the PassJoin/partition
family, Li et al. 2011): split each key string into ``n_segments``
contiguous segments; by pigeonhole, two EQUAL-LENGTH strings within
substitution distance τ < n_segments must agree on at least
n_segments − τ segments — so any shared (position, segment) value is
a candidate signal, and pairs sharing none can be skipped EXACTLY
(for substitution-only distance; general indels can shift every
later segment, so for full Levenshtein the blocking is high-recall,
not exact — callers needing exact indel recall use the shifted-
segment PassJoin extension, deliberately out of scope here).

Scale shape — identical to the MinHash/LSH dedup family
(dedup.lsh_candidate_pairs, whose cap semantics this reuses):

- One narrow (block key, segment, id) frame rides the shuffle —
  never the payload row.
- The self-join is block-local; ``max_block`` drops degenerate
  blocks (a constant key prefix puts every row in one block — the
  analog of a boilerplate shingle bucket) so the worst case is
  bounded at cap² per block.
- The expensive verify (Levenshtein, quadratic per pair in string
  length) runs on candidates only, with the text joined back by id —
  and uses Spark's THRESHOLDED levenshtein(l, r, k), which
  early-exits lanes past k instead of filling the full DP matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_keys(text: Column | str, n_segments: int) -> Column:
    """array<string> of ``n_segments`` contiguous segments covering
    the string: segment i = chars [floor(i·L/k), floor((i+1)·L/k))
    (1-based substring below). Equal-length strings get identical
    boundaries — the pigeonhole precondition."""
    t = F.col(text) if isinstance(text, str) else text
    length = F.length(t)
    segs = [
        F.substring(
            t,
            (F.floor(F.lit(i) * length / n_segments) + 1).cast("int"),
            (
                F.floor(F.lit(i + 1) * length / n_segments)
                - F.floor(F.lit(i) * length / n_segments)
            ).cast("int"),
        )
        for i in range(n_segments)
    ]
    return F.array(*segs)


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: tuple[str, ...] = (),
    max_dist: int = 2,
    n_segments: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Fuzzy match pairs (id_a < id_b, dist ≤ ``max_dist``) via
    segment blocking + thresholded-Levenshtein verify.

    ``block_cols`` are exact-match pre-blocks (e.g. a nation key —
    rows in different pre-blocks are never compared). On top of each
    pre-block, rows co-block on any shared (segment position,
    segment value); ``n_segments`` defaults to ``max_dist + 1`` (the
    pigeonhole minimum); more segments = more selective blocks at
    the cost of more candidate passes. ``max_block`` drops blocks
    larger than the cap BEFORE the self-join (dedup.lsh_candidate_
    pairs semantics: a capped block's rows can still pair through
    their other, more selective segments).

    Returns (id_a, id_b, dist)."""
    k = n_segments if n_segments is not None else max_dist + 1
    if k <= max_dist:
        raise ValueError(
            f"n_segments={k} <= max_dist={max_dist}: pigeonhole needs "
            "at least max_dist+1 segments"
        )
    blocks = df.select(
        *block_cols,
        F.col(id_col),
        F.posexplode(segment_keys(text_col, k)).alias("__i", "__seg"),
    )
    key = [*block_cols, "__i", "__seg"]
    if max_block is not None:
        small = (
            blocks.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_block)
            .select(*key)
        )
        blocks = blocks.join(small, key)
    a = blocks.select(*key, F.col(id_col).alias("id_a"))
    b = blocks.select(*key, F.col(id_col).alias("id_b"))
    cands = (
        a.join(b, key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify on candidates only; text joins back by id so the payload
    # never rides the block shuffle (the _verify_cosine_pairs shape)
    ta = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")
    )
    tb = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")
    )
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "dist", F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
        )
        .filter(F.col("dist") >= 0)  # thresholded form: -1 = past cap
        .select("id_a", "id_b", "dist")
    )
