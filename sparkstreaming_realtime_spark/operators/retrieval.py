"""Lexical retrieval: BM25 ranking over the document corpus.

The reference serves keyword search through Elasticsearch's
``match`` query (PublishDaoImpl.java:58-61 — analyzed match-AND,
which functions/text.py:match_all_terms already reproduces as a
boolean predicate). What the boolean form misses is the RANKING: ES
scores matches with BM25 (its default similarity since 5.0), so "the
top documents for these terms" is reference-visible behavior with no
engine-side counterpart until now. A training-data pipeline needs
the same primitive for corpus triage: given seed terms, surface the
most relevant documents (positive mining, targeted decontamination,
eval-set curation).

BM25 (Robertson/Sparck Jones, the Okapi form ES documents):

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))

Scale shape (100 TB corpus, tiny query):

- The explode/tf scan filters to the query's terms BEFORE the
  grouping shuffle — per-term state is O(matching docs), never
  O(corpus vocabulary).
- Document lengths come from ``size(tokenize(text))`` in the same
  projection — a pure map, no length shuffle.
- ``df`` and the (N, avgdl) scalars are one tiny aggregate each,
  broadcast back (explicit ``F.broadcast``) — the only wide exchange
  is the per-(doc, term) tf groupBy, keyed by doc_id for the final
  per-doc sum.
- Top-k is ``orderBy().limit(k)`` → TakeOrdered, no global sort.

Everything is built-in column math (ln/division in whole-stage
codegen); zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

#: Okapi defaults, shared with the registry oracle (ES uses the same).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms``.

    Returns (id_col, bm25, n_hit_terms) — score rounded to 4 dp for
    engine-portable hashing, ties broken by ascending id. Documents
    matching no query term never appear (their score is 0 by
    definition, and emitting the whole corpus for a query would be
    absurd at scale); ``n_hit_terms`` lets callers demand match-AND
    semantics (n_hit_terms == len(query_terms)) without a second
    scan."""
    if not query_terms:
        raise ValueError("bm25_search needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})

    # one corpus scan feeds both signals: per-doc length (pure map)
    # and the query-term postings (filter BEFORE the shuffle)
    toked = docs.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    )
    dl = toked.select(id_col, F.size("__toks").alias("dl"))
    postings = toked.select(
        id_col, F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(terms))

    tf = postings.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df per query term: tf already holds one row per (doc, term)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus scalars: N over ALL docs, avgdl over ALL docs (a
    # zero-token doc counts length 0 — same convention in the oracle)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    return bm25_rank(tf, dfreq, dl, stats, k=k, k1=k1, b=b, id_col=id_col)


def bm25_rank(
    tf: DataFrame,
    dfreq: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """The BM25 scoring fold over its four index frames — tf
    (id, term, tf), dfreq (term, df), dl (id, dl), stats (one row:
    n_docs double, avgdl double) — shared VERBATIM by the one-shot
    :func:`bm25_search` and the streaming index read path
    (streaming/sinks.py:read_bm25_index), so both produce
    bit-identical scores (the transition_matrix_from_counts
    discipline)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    # Per-term scores quantize to integer micro-units BEFORE the
    # per-doc sum: a double-precision Σ over partial aggregates is
    # combine-order-dependent (partitioning-dependent), so a 4dp
    # round could flip at a .00005 boundary and break engine parity.
    # Integer addition is exactly associative — same convention as
    # functions/money.py cents and lm.py micro-nats. Each per-term
    # score itself is a fixed-order double expression, bit-identical
    # across engines, so the micro-round input matches too.
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__s_micro", F.round(idf * norm * 1e6).cast("long"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__s_micro") / 1e6, 4).alias("bm25"),
            F.count("*").alias("n_hit_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def phrase_occurrences(toks, phrase: tuple[str, ...]):
    """Occurrence count of an exact token phrase inside a token array
    — ES's ``match_phrase`` semantics (terms adjacent, in order, slop
    0) as a pure IN-ROW expression: for each window start i, check
    all k positions (F.get is 0-based and NULL-safe, so no ANSI
    out-of-bounds risk). Zero shuffle, zero explode — the corpus is
    never blown up to one row per position the way a positional
    postings index would; at 100 TB this is a plain filter the scan
    pipeline absorbs. ``toks`` must be a bound column reference (the
    no-CSE-in-HOF rule: bind the tokenize() behind an
    explode(array()) barrier first)."""
    import functools

    k = len(phrase)
    n = F.size(toks)

    def window_matches(i):
        return functools.reduce(
            lambda acc, jw: acc
            & (F.get(toks, i - 1 + jw[0]) == F.lit(jw[1])),
            enumerate(phrase),
            F.lit(True),
        )

    starts = F.when(
        n >= k,
        F.filter(F.sequence(F.lit(1), n - k + 1), window_matches),
    ).otherwise(F.array().cast("array<int>"))
    return F.size(starts).cast("bigint")


def match_phrase_docs(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Documents matching an exact phrase, with occurrence counts —
    the ``match_phrase`` sibling of the reference's analyzed match
    query (functions/text.py:match_all_terms covers match-AND;
    PublishDaoImpl.java:58-61 builds the analyzed match — phrase is
    the next query type the same ES surface serves). The phrase is
    analyzed with the SAME tokenizer as the corpus, so 'Slow, HASH
    batch!' matches 'slow hash batch'. Returns (doc_id, lang,
    n_occurrences) for matching docs, (occurrences desc, doc_id)
    ordered."""
    from ..functions.text import _py_tokenize

    terms = tuple(_py_tokenize(phrase))
    if not terms:
        raise ValueError("phrase analyzed to zero tokens")
    bound = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array(tokenize(text_col))).alias("__tk"),
    )
    occ = bound.select(
        "doc_id",
        "lang",
        phrase_occurrences(F.col("__tk"), terms).alias("n_occurrences"),
    )
    return (
        occ.filter(F.col("n_occurrences") > 0)
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
    )


#: RRF constant (Cormack/Clarke/Buettcher 2009's k=60 — the value
#: Elasticsearch's ``rrf`` retriever also defaults to) and the
#: integer scale that keeps fused scores exact: contributions are
#: SCALE div (k + rank), a BIGINT floor division both engines
#: compute identically — no float summation order to disagree on.
RRF_K = 60
RRF_SCALE = 1_000_000_000_000


def rrf_fuse(
    branches: list[tuple[str, DataFrame, str, list]],
    k: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of already-ranked retrieval branches —
    hybrid search's standard combinator (Cormack et al. 2009; the
    reference's ES surface grew the same ``rrf`` retriever for
    combining its ``match`` ranking with vector hits).

    ``branches``: (name, frame, id_col, order_exprs) per branch — a
    TOP-K list each (the lexical/vector probe already pruned it), so
    every frame here is k rows and the fusion runs at driver scale;
    the single-partition ``row_number`` window is the correct tool
    on a k-row frame, not a scale hazard. Ranks join full-outer on
    the id (a doc ranked by one branch only still scores), and the
    fused score is Σ SCALE div (k + rank_b) — exact integers, so
    Spark and any SQL oracle agree bit-for-bit. Returns
    (id, rank_<name>..., rrf_micro) ordered (rrf_micro desc, id),
    limit ``topk``."""
    from pyspark.sql import Window

    fused = None
    for name, df, id_col, order in branches:
        w = Window.orderBy(*order)
        ranked = df.select(
            F.col(id_col).alias("id"),
            F.row_number().over(w).cast("bigint").alias(f"rank_{name}"),
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, "id", "full_outer")
        )
    contrib = [
        F.coalesce(
            F.expr(f"{RRF_SCALE} div ({k} + rank_{name})"),
            F.lit(0).cast("bigint"),
        )
        for name, _df, _id, _o in branches
    ]
    score = contrib[0]
    for c in contrib[1:]:
        score = score + c
    return (
        fused.withColumn("rrf_micro", score.cast("bigint"))
        .orderBy(F.desc("rrf_micro"), F.asc("id"))
        .limit(topk)
    )
