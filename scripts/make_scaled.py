"""Generate a scaled-up copy of a driver SF directory for the
PERF.md scaling probe: union N offset copies of each fact table
(dims nation/region stay single-copy, like real growth), so row
counts and key cardinalities scale ×N while per-key distributions
match the source.

Documents get a per-copy deterministic letter substitution
(``translate``) so the duplicate RATE stays constant instead of every
doc gaining N exact/near copies — a 10× corpus has more docs, not 10
copies of each; without this the pairwise dedup stages would scale
×N² by construction and measure the wrong thing. Embeddings keep
their vectors (scan-shaped ANN costs scale with rows).

Usage: python scripts/make_scaled.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from sparkstreaming_realtime_spark.session import get_spark

#: id columns to offset per copy, by table (fact keys only — nation /
#: region keys and the n_nationkey FKs stay fixed, dims don't scale)
OFFSET_COLS = {
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("nation", "region")
BASE = 1_000_000_000  # > any sf0.1 id


def _letter_perm(src: str, i: int) -> str:
    """Deterministic non-identity permutation of ``src`` for copy
    ``i`` — letters sorted by a per-(seed, letter) md5 digest, so the
    permutation depends only on the md5 SPEC, never on random-module
    internals (r9 ADVICE: random.Random(seed).sample()'s output
    sequence is not guaranteed stable across Python versions, so a
    fixture regenerated on a different interpreter could silently
    differ from the one behind recorded probe artifacts). Re-seeded
    on the (astronomically unlikely) identity draw so no copy is ever
    a verbatim text twin of copy 0; distinct seeds give independent
    digests, colliding with probability ~n²/26! — never."""
    import hashlib

    seed = i
    while True:
        perm = "".join(
            sorted(src, key=lambda ch: hashlib.md5(
                f"{seed}:{ch}".encode()).hexdigest())
        )
        if perm != src:
            return perm
        seed += 1_000_003  # pragma: no cover — P(identity) ~ 1/26!


def _copy(df: DataFrame, table: str, i: int) -> DataFrame:
    out = df
    for c in OFFSET_COLS.get(table, ()):
        out = out.withColumn(c, F.col(c) + F.lit(i * BASE))
    if table == "documents" and i > 0:
        # deterministic per-copy letter PERMUTATION: decorrelates
        # copies (different shingles/fingerprints) while within-copy
        # dup structure — the thing the dedup ops measure — is
        # preserved. A seeded permutation, NOT a rotation: the old
        # ``src[i:] + src[:i]`` is the IDENTITY for every i >= 26
        # (Python slicing caps at the string end), so a factor-100
        # fixture carried ~74 verbatim twins of every base doc and
        # the dedup probes measured a quadratically densified fixture
        # artifact (doc_dup_keep_longest read ×270 at ×100; its tail
        # joins measure 1.7 s — the pair graph was the whole cost).
        # Same bug class the embeddings sign-flip mask fixed for the
        # vector side; this is the text analog. 26! permutations
        # never cycle; _letter_perm rejects the identity.
        src = "abcdefghijklmnopqrstuvwxyz"
        out = out.withColumn(
            "text", F.translate("text", src, _letter_perm(src, i))
        )
    if table == "customer" and i > 0:
        # per-copy DIGIT permutation on c_name: Levenshtein is
        # invariant under an alphabet bijection, so within-copy edit
        # structure — what customer_fuzzy_match measures — is
        # preserved, while cross-copy verbatim name twins disappear
        # (a raw copy keeps c_name while offsetting c_custkey, so a
        # ×100 fixture would carry 100 identical (nation, name) rows
        # per base customer → C(100,2) zero-distance pairs each —
        # the text-twin artifact class the documents permutation and
        # the embeddings sign-flip already fix)
        digits = "0123456789"
        out = out.withColumn(
            "c_name", F.translate("c_name", digits, _letter_perm(digits, i))
        )
    if table == "embeddings" and i > 0:
        # circular-shift the vector per copy: copies point in
        # ~orthogonal directions (a shifted Gaussian vector is a fresh
        # draw), so the NEAR-DUP rate stays constant with scale — a
        # verbatim copy would give every vector factor-1 exact twins
        # and the pair graph would densify ×factor² by construction
        # (measured: ×10.7 "scaling" on emb_semantic_dedup that was
        # pure fixture artifact). ANN scan costs still scale with
        # rows, which is what the emb probes measure.
        # shift cycles 1..63 (never 0 mod 64): copy 64 would otherwise
        # rotate back to the identity — a verbatim twin of the base —
        # and copy 66 would slice with negative length and crash
        shift = (i - 1) % 63 + 1
        out = out.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), shift + 1, 64 - shift),
                F.slice(F.col("embedding"), 1, shift),
            ),
        )
        # the shift alone cycles with period 63 — copies i and i+63
        # would share a transform and reintroduce exact twins (and the
        # quadratic pair-graph artifact) past factor 63. Compose with a
        # per-63-block sign-flip mask (coordinate j flips iff bit j of
        # the block index is set): blocks get distinct masks up to
        # 2^63 copies, a flipped Gaussian stays Gaussian, and block 0
        # (factors <= 63) is the identity — probe outputs unchanged.
        block = (i - 1) // 63
        if block:
            signs = F.array(
                *[
                    F.lit(-1.0 if (block >> (j % 63)) & 1 else 1.0)
                    for j in range(64)
                ]
            )
            out = out.withColumn(
                "embedding",
                # cast back: the double sign literal must not widen the
                # stored element type (readers pin the source schema)
                F.zip_with("embedding", signs, lambda x, s: x * s).cast(
                    dict(df.dtypes)["embedding"]
                ),
            )
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scaled"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_scaled")
    spark.sparkContext.setLogLevel("ERROR")
    for table in list(OFFSET_COLS) + list(DIMS):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in DIMS:
            scaled = df
        else:
            copies = [_copy(df, table, i) for i in range(factor)]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        # one flat parquet file-set per table, same layout the driver
        # uses (<dir>/<table>.parquet)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        n = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
