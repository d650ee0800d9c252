"""BPE merge learning (operators/bpe.py): hand-computed merge tables
on tiny corpora — the delimiter-anchored replace must reproduce
textbook leftmost-first greedy merging, ties break (count desc, l,
r), and later ranks must see earlier merged symbols."""

from __future__ import annotations

from sparkstreaming_realtime_spark.operators.bpe import bpe_learn_merges


def _merges(spark, texts, k):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.rank, r.lhs, r.rhs, r.pair_n)
        for r in bpe_learn_merges(docs, n_merges=k).collect()
    ]


def test_bpe_textbook_sequence(spark):
    # vocabulary {"abab": 3, "ab": 2}: pairs a|b = 3*2+2 = 8,
    # b|a = 3. rank1 merges (a,b); states -> ab ab / ab.
    # rank2: pair (ab, ab) = 3 -> merges to abab.
    got = _merges(spark, ["abab abab abab ab ab"], 2)
    assert got == [(1, "a", "b", 8), (2, "ab", "ab", 3)]


def test_bpe_greedy_leftmost_on_runs(spark):
    # "aaa" x2: pairs a|a = 2 per word x2 words = 4; after merging
    # (a,a) leftmost-first each "aaa" -> [aa, a], so rank2 sees
    # aa|a = 2 (NOT a|aa — greedy left attachment)
    got = _merges(spark, ["aaa aaa"], 2)
    assert got[0] == (1, "a", "a", 4)
    assert got[1] == (2, "aa", "a", 2)


def test_bpe_tie_breaks_lexicographically(spark):
    # "xy" and "ab" each appear twice: pair counts x|y = 2 and
    # a|b = 2 tie -> (a, b) wins on (l, r) order
    got = _merges(spark, ["xy ab", "ab xy"], 1)
    assert got == [(1, "a", "b", 2)]


def test_bpe_weighted_by_word_frequency(spark):
    # "zz" appears 5 times as a word, "qr" once: z|z = 5 beats
    # q|r = 1 even though both are one word TYPE each
    got = _merges(spark, ["zz zz zz zz zz qr"], 1)
    assert got == [(1, "z", "z", 5)]


def test_bpe_partitioning_independent(spark):
    texts = ["the cat sat on the mat", "the bat and the rat", "a cat"]
    docs1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(1)
    docs7 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(7)
    a = [tuple(r) for r in bpe_learn_merges(docs1, n_merges=4).collect()]
    b = [tuple(r) for r in bpe_learn_merges(docs7, n_merges=4).collect()]
    assert a == b


def test_bpe_segment_and_compression(spark):
    from pyspark.sql import functions as F

    from sparkstreaming_realtime_spark.operators.bpe import (
        bpe_compression,
        bpe_segment,
    )

    df = spark.createDataFrame(
        [("aaab",), ("ba",)], "t string"
    ).select(
        bpe_segment(F.col("t"), [("a", "a"), ("aa", "b")]).alias("s")
    )
    got = [r.s for r in df.collect()]
    # "aaab": (a,a) leftmost -> [aa, a, b]; (aa,b) doesn't apply
    # (aa is followed by a) -> ^aa|^a|^b|
    assert got[0] == "^aa|^a|^b|"
    assert got[1] == "^b|^a|"

    docs = spark.createDataFrame(
        [(1, "en", "aaab ba"), (2, "de", "cc")],
        "doc_id long, lang string, text string",
    )
    rows = {
        r.lang: (r.n_tokens, r.n_chars, r.n_symbols, r.compression)
        for r in bpe_compression(
            docs, [("a", "a"), ("aa", "b")]
        ).collect()
    }
    # en: "aaab" -> 3 symbols, "ba" -> 2; chars 4 + 2
    assert rows["en"] == (2, 6, 5, round(5 / 6, 4))
    # de: "cc" untouched -> 2 symbols / 2 chars
    assert rows["de"] == (1, 2, 2, 1.0)
