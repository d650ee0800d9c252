"""Cluster-durable DataFrame materialization.

``localCheckpoint`` is tempting for cutting lineage / sharing a
subtree across plan branches, but it writes blocks to executor-LOCAL
storage with no replication and no lineage to recompute from: on a
real cluster, losing ONE executor mid-job kills a 100 TB run
(VERDICT r2 #3). ``eager=False`` localCheckpoint also interacts
poorly with AQE's runtime re-planning.

:func:`materialize` is the durable replacement used by the dedup /
curation hot paths:

- If the session has a reliable checkpoint dir configured
  (``sparkContext.setCheckpointDir`` — on a cluster, an HDFS/S3
  path), use ``df.checkpoint()``: lineage is truly cut (bounds plan
  depth in iterative loops) and blocks survive executor loss.
- Otherwise ``persist(StorageLevel.DISK_ONLY)``: blocks spill to
  disk (no memory pressure on 100 TB intermediates) and remain
  RECOMPUTABLE from lineage if an executor dies — strictly safer
  than localCheckpoint. Lineage is not cut, which is fine for the
  bounded loops here (label propagation converges in 2–4 rounds).

Callers that finish with an intermediate should ``unpersist()`` it
explicitly (see :func:`release`).

Lifecycle asymmetry to know about: :func:`release` /
:func:`release_all` can only drop PERSISTED blocks — a reliable
checkpoint's files belong to the checkpoint dir and outlive the
DataFrame. A cluster deployment that sets a checkpoint dir should
also set ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
(a SparkConf, fixed at context creation) or manage the directory's
retention externally; otherwise iterative callers (dup_clusters
checkpoints per round) accumulate files until the context stops.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: every frame materialize() has persisted and not yet released —
#: lets a long-lived session (the driver's correctness harness, the
#: bench loop) drop blocks from finished queries via release_all().
#: Leaked persisted blocks degrade later queries in the same session
#: (measured ~4× on the bench tail), so cleanup is not optional.
_LIVE: list[DataFrame] = []


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Durably materialize ``df`` for reuse across plan subtrees.

    ``eager=True`` forces computation now (use inside iterative loops
    where the next step's plan must not recompute this one); lazy
    otherwise — the first action populates the store.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        # reliable checkpoint: replicated storage + true lineage cut
        return df.checkpoint(eager=eager)
    out = df.persist(StorageLevel.DISK_ONLY)
    _LIVE.append(out)
    if eager:
        out.count()
    return out


def release(df: DataFrame) -> None:
    """Drop a materialized intermediate's blocks (no-op for reliable
    checkpoints, which are owned by the checkpoint dir)."""
    try:
        df.unpersist()
    except Exception:  # pragma: no cover — best-effort cleanup
        pass
    _LIVE[:] = [d for d in _LIVE if d is not df]


def release_all() -> None:
    """Unpersist every still-live materialized frame. Called by the
    query registry on entry to each query, so blocks from FINISHED
    queries never pile up across a long gate/bench session — only
    the engine's own frames are touched (never a caller's caches,
    unlike ``spark.catalog.clearCache()``)."""
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:  # pragma: no cover
            pass
    _LIVE.clear()
