"""Similarity search over embedding columns (array<float>).

Two strategies, both pure DataFrame ops (``zip_with``/``aggregate``
dot products from ``functions.vectors`` — JVM-side, no Arrow
transfer):

- **Brute-force top-k**: score every vector against the query and
  ``orderBy(...).limit(k)``. Catalyst turns that into
  TakeOrderedAndProject — per-partition partial top-k, then a k-row
  merge on the driver. The per-row scan is what costs; at 100 TB this
  is the *correctness baseline*, not the serving path.
- **IVF (inverted-file) top-k**: k-means-style cells, here seeded by
  the corpus's ``label`` column (a real pipeline would store learned
  centroid ids the same way). Query → nearest centroid (tiny,
  broadcast) → scan only that cell's partition. The cell filter is a
  partition-prunable predicate, so the 100 TB scan becomes a
  1/n_cells scan. Recall depends on how well cells cluster the data —
  the operator reports the probed cell so callers can probe more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def query_vector(emb: DataFrame, vec_id: int, id_col: str = "vec_id") -> DataFrame:
    """One-row frame holding the query embedding (broadcast later)."""
    return emb.filter(F.col(id_col) == vec_id).select(
        F.col("embedding").alias("__qv")
    )


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against a one-row query frame.

    ``orderBy(desc(cos), id).limit(k)`` compiles to
    TakeOrderedAndProject: each partition keeps its local top-k, the
    driver merges k·n_partitions rows — no global sort, no single-task
    window. Cosine is rounded to 6dp *before* ordering so the ranking
    is reproducible across engines (float associativity)."""
    scored = emb.crossJoin(F.broadcast(query))
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return (
        scored.select(
            F.col(id_col),
            F.col("label"),
            F.round(cosine_similarity("embedding", "__qv"), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def centroids_by_cell(
    emb: DataFrame, dim: int, cell_col: str = "label"
) -> DataFrame:
    """Per-cell mean vector as an array column. One shuffle on the
    cell id with map-side partial avg (64 scalar avgs, not an array
    UDAF — each is codegen'd)."""
    return emb.groupBy(cell_col).agg(
        F.array(
            *[F.avg(F.col("embedding")[i].cast("double")) for i in range(dim)]
        ).alias("centroid")
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    cell_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF search: route the query to its nearest cell centroid, then
    brute-force only that cell.

    The centroid table is tiny (n_cells rows) → broadcast both ways;
    the cell filter prunes the big scan (with the corpus written
    ``partitionBy(cell)``, it is partition pruning, not even a scan).
    Returns (vec_id, label, cos) like :func:`cosine_topk` so the two
    strategies are drop-in comparable."""
    cents = centroids_by_cell(emb, dim, cell_col)
    best_cell = (
        cents.crossJoin(F.broadcast(query))
        .select(
            F.col(cell_col),
            F.round(cosine_similarity("centroid", "__qv"), 6).alias("__ccos"),
        )
        .orderBy(F.desc("__ccos"), F.asc(cell_col))
        .limit(1)
        .select(cell_col)
    )
    cell_members = emb.join(F.broadcast(best_cell), cell_col)
    return cosine_topk(cell_members, query, k, id_col, exclude_id)
