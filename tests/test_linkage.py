"""Blocked fuzzy matching (operators/linkage.py): segment-blocking
recall on substitution pairs, cap semantics, and the thresholded
verify."""

from __future__ import annotations

import pytest

from sparkstreaming_realtime_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    segment_keys,
)


def test_segment_keys_cover_string_with_floor_boundaries(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("abcdefgh",), ("abc",), ("",)], "s string"
    )
    rows = df.select(
        segment_keys("s", 3).alias("segs"), F.col("s")
    ).collect()
    got = {r.s: r.segs for r in rows}
    # floor boundaries: 8 chars / 3 -> [0,2) [2,5) [5,8)
    assert got["abcdefgh"] == ["ab", "cde", "fgh"]
    # 3 chars / 3 -> one char each
    assert got["abc"] == ["a", "b", "c"]
    # concatenation always reconstructs the string
    for s, segs in got.items():
        assert "".join(segs) == s


def test_blocked_fuzzy_pairs_finds_substitution_pairs_exactly(spark):
    # equal-length keys, substitution-only distances: pigeonhole with
    # n_segments=3 > max_dist=2 means EVERY true pair is found
    df = spark.createDataFrame(
        [
            (1, "AAABBBCCC"),
            (2, "AAABBBCCX"),  # dist 1 to id 1
            (3, "AAABBXCCX"),  # dist 2 to id 1, dist 1 to id 2
            (4, "XXXYYYZZZ"),  # far from everything
            (5, "ZZZYYYXXX"),  # shares middle segment with 4, dist 6
        ],
        "id long, name string",
    )
    out = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name", max_dist=2, n_segments=3
    )
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 1}


def test_blocked_fuzzy_pairs_cap_drops_degenerate_blocks_only(spark):
    # every row shares segment 0 ("AAA"); rows 1-2 also share the
    # discriminative tail. Capping blocks at 3 drops the degenerate
    # prefix block but the (1,2) pair survives through its other
    # segments — lsh max_bucket semantics.
    rows = [(i, "AAA" + f"{i * 111111:06d}") for i in range(3, 9)]
    rows += [(1, "AAA000111"), (2, "AAA000112")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name",
        max_dist=2, n_segments=3, max_block=3,
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in got
    # without the cap the prefix block admits cross pairs too
    uncapped = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name", max_dist=2, n_segments=3
    )
    assert len(uncapped.collect()) >= len(got)


def test_blocked_fuzzy_pairs_respects_pre_blocks(spark):
    # identical names in different pre-blocks never pair
    df = spark.createDataFrame(
        [(1, 10, "same"), (2, 20, "same"), (3, 10, "same")],
        "id long, grp long, name string",
    )
    out = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name",
        block_cols=("grp",), max_dist=2, n_segments=3,
    )
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 3)}


def test_blocked_fuzzy_pairs_rejects_too_few_segments(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="pigeonhole"):
        blocked_fuzzy_pairs(
            df, id_col="id", text_col="name", max_dist=3, n_segments=3
        )


def test_blocked_fuzzy_pairs_substitution_recall_fuzz(spark):
    """The pigeonhole claim, fuzzed: for EVERY random equal-length
    pair within substitution distance <= max_dist, segment blocking
    (n_segments > max_dist) must surface the pair — exact recall, not
    probabilistic. 60 seeded base strings, each with a <=2-substitution
    twin at a random position mix, one DataFrame, one pass."""
    import random

    rng = random.Random(20260815)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows, expected = [], set()
    for i in range(60):
        n = rng.randint(6, 24)
        base = "".join(rng.choice(alpha) for _ in range(n))
        n_subs = rng.randint(1, 2)
        pos = rng.sample(range(n), n_subs)
        twin = list(base)
        for p in pos:
            twin[p] = rng.choice([c for c in alpha if c != base[p]])
        twin = "".join(twin)
        a, b = 2 * i, 2 * i + 1
        rows += [(a, base), (b, twin)]
        expected.add((a, b))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in blocked_fuzzy_pairs(
            df, id_col="id", text_col="name", max_dist=2, n_segments=3
        ).collect()
    }
    # every planted pair found (exact recall for substitutions) —
    # extra cross-pairs are allowed (random strings can collide
    # within distance 2, and the verify keeps them, correctly)
    missing = expected - got
    assert not missing, f"pigeonhole recall violated: {sorted(missing)[:5]}"
