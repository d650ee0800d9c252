"""BPE merge learning: induce a byte-pair-encoding merge table from
the corpus (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the TRAINING side of
tokenization, complementing textstats.bpe_ish_token_count's fixed
heuristic. The reference has no tokenizer induction; this is part of
the training-data-pipeline extension surface (a corpus engine that
can't learn its own vocabulary can't feed a tokenizer trainer).

Algorithm shape (the published one): BPE trains on the WORD-FREQUENCY
vocabulary, not the raw corpus — one corpus-token shuffle builds
(word, count), and every merge iteration runs over that vocabulary
frame (distinct word types: orders of magnitude below corpus tokens;
still a DataFrame, never a driver-side dict — at 100 TB the type
vocabulary is itself hundreds of millions of rows). Per iteration:

1. count adjacent symbol pairs weighted by word frequency (map-side
   combinable sum),
2. take the globally most frequent pair (TakeOrdered limit 1 — the
   single tiny driver collect per round; ties break (count desc,
   left, right), deterministic in both engines),
3. apply the merge everywhere.

The merge application is the engine-portability trick: symbol
sequences are stored as ONE delimited string per word,
``^sym|^sym|...|`` — every symbol carries its own ``^``/``|``
delimiters, so the plain (non-regex) string replacement

    replace(state, '^l|^r|', '^lr|')

is exactly BPE's leftmost-first non-overlapping merge pass: a match
consumes both full symbols including their private delimiters, so
adjacent matches share no characters (``^a|^a|^a|`` under (a,a) →
``^aa|^a|``, the textbook greedy result), and a false submatch is
impossible because symbols are alphanumeric (tokenize strips
everything else) while the delimiters are not. Both engines'
``replace`` are plain left-to-right scans, so the vocabulary states
stay bit-identical and the DuckDB oracle replays the whole training
loop as 2·k chained CTEs.

Pair extraction re-derives the symbol array by splitting that same
string (bound ONCE behind an explode(array()) barrier — the
no-CSE-in-HOF rule), so the string column is the only iteration
state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: regex that turns a token into its initial BPE state: one
#: ``^char|`` cell per code point ('.' is one code point in both
#: Java regex and RE2, verified on accented text)
INIT_STATE_RE = r"(.)"
INIT_STATE_SUB = r"^$1|"


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns (rank, lhs, rhs, pair_n): merge ``rank`` joined symbols
    ``lhs``+``rhs``, which co-occurred adjacently ``pair_n`` times
    (weighted by word frequency) at the time it was chosen. The frame
    is driver-built from k single-row collects — the merge TABLE is
    the model artifact and is k rows by definition; all counting
    stays distributed."""
    from ..functions.text import tokenize
    from ..materialize import ensure_checkpoint_dir, materialize

    spark = docs.sparkSession
    ensure_checkpoint_dir(spark)
    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .select(
            F.regexp_replace("__t", INIT_STATE_RE, INIT_STATE_SUB).alias(
                "__s"
            ),
            "__c",
        )
    )
    vocab = materialize(vocab, eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        syms_expr = F.split(
            F.regexp_replace(
                F.regexp_replace(F.col("__s"), r"^\^", ""), r"\|$", ""
            ),
            r"\|\^",
        )
        sy = vocab.select(
            "__c", F.explode(F.array(syms_expr)).alias("__sy")
        )
        s = F.col("__sy")
        n = F.size(s)
        pair_structs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.get(s, i - 1).alias("l"), F.get(s, i).alias("r")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        best = (
            sy.select(F.explode(pair_structs).alias("__p"), "__c")
            .groupBy("__p.l", "__p.r")
            .agg(F.sum("__c").cast("bigint").alias("__n"))
            .orderBy(F.desc("__n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b.l, b.r, b["__n"]))
        vocab = materialize(
            vocab.select(
                F.replace(
                    F.col("__s"),
                    F.lit(f"^{b.l}|^{b.r}|"),
                    F.lit(f"^{b.l}{b.r}|"),
                ).alias("__s"),
                "__c",
            ),
            eager=True,
        )
    return spark.createDataFrame(
        merges, "rank bigint, lhs string, rhs string, pair_n bigint"
    )


def bpe_state(text_token_col: Column | str) -> Column:
    """Initial BPE state of a token: one ``^char|`` cell per code
    point (see module docstring for why this string form makes the
    merge pass a plain replace)."""
    return F.regexp_replace(text_token_col, INIT_STATE_RE, INIT_STATE_SUB)


def bpe_segment(
    token_col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Apply a learned merge table (rank order) to a token column —
    the ENCODE side of BPE. ``merges`` is the (lhs, rhs) list
    :func:`bpe_learn_merges` produced (collected model artifact: the
    merge table is the tokenizer, and like any model it broadcasts as
    literals into the encode expression — k nested plain replaces,
    zero joins, zero shuffles, whole-stage codegen). Returns the
    delimited state string; count symbols by counting ``|``."""
    state = bpe_state(token_col)
    for lhs, rhs in merges:
        state = F.replace(
            state, F.lit(f"^{lhs}|^{rhs}|"), F.lit(f"^{lhs}{rhs}|")
        )
    return state


def bpe_compression(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group tokenizer quality report: how far the learned merge
    table compresses the corpus. Returns (``group_col``, n_tokens,
    n_chars, n_symbols, compression): total corpus tokens, their
    code-point count, the symbol count after applying ``merges``, and
    symbols/chars rounded 4dp (1.0 = no compression; lower = the
    merges fire often) — the held-out metric a tokenizer-training
    loop monitors. One explode + one map-side-combinable aggregate;
    the encode is per-row codegen (see :func:`bpe_segment`)."""
    from ..functions.text import tokenize

    toks = docs.select(
        F.col(group_col), F.explode(tokenize(text_col)).alias("__t")
    )
    # bind the encoded state ONCE per token (Catalyst does not CSE
    # the k-replace chain across the two length references)
    staged = toks.select(
        group_col,
        F.length("__t").cast("bigint").alias("__chars"),
        bpe_segment(F.col("__t"), merges).alias("__st"),
    )
    enc = staged.select(
        group_col,
        "__chars",
        # each symbol cell ends with exactly one '|': symbol count =
        # state length minus the state with '|' removed
        (
            F.length("__st")
            - F.length(F.replace(F.col("__st"), F.lit("|"), F.lit("")))
        )
        .cast("bigint")
        .alias("__syms"),
    )
    return enc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__chars").cast("bigint").alias("n_chars"),
        F.sum("__syms").cast("bigint").alias("n_symbols"),
        F.round(
            F.sum("__syms").cast("double") / F.sum("__chars").cast("double"),
            4,
        ).alias("compression"),
    )
