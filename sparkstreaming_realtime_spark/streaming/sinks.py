"""Streaming sinks (SURVEY K1–K6, T5).

The reference achieves effective exactly-once by pairing at-least-once
offsets with idempotent writes: Kafka producer idempotence
(``MykafkaUtils.scala:90``) and ES doc-ids that make replays
overwrite (``MyEsUtils.scala:47``, ``DwdDauApp.scala:167``). The
engine's equivalent: checkpointed sources + a ``foreachBatch`` writer
whose output location is a *deterministic function of the batch id*,
so a replayed batch overwrites its own previous attempt instead of
appending duplicates (T5/K5).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_sink_options(
    topic: str, bootstrap_servers: str = "localhost:9092"
) -> dict[str, str]:
    """K1/K2: Kafka sink options. The frame must carry string
    ``value`` (and optional ``key`` for hash partitioning — the keyed
    send of MykafkaUtils.scala:112-114); producer idempotence and
    per-epoch flush (K3) are sink built-ins."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def idempotent_parquet_sink(
    path: str,
    key_cols: tuple[str, ...],
    partition_col: str | None = "dt",
):
    """T5/K5: a ``foreachBatch`` writer with replay-safe semantics.

    Per batch: (1) dedup on the doc key inside the batch (the ES
    doc-id collapse, MyEsUtils.scala:41-52); (2) write to
    ``<path>/batch=<id>`` — replays of the same epoch overwrite the
    same directory, so at-least-once delivery composes to
    exactly-once output (the engine analog of doc-id upserts).
    Readers take ``read_sink(path)``.

    At scale the per-batch directory write is embarrassingly
    parallel; the dedup is one narrow shuffle on the doc key.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(path, f"batch={batch_id}")
        deduped = batch_df.dropDuplicates(list(key_cols))
        writer = deduped.write.mode("overwrite")
        if partition_col and partition_col in batch_df.columns:
            writer = writer.partitionBy(partition_col)
        writer.parquet(out)

    return write


def read_sink(spark, path: str) -> DataFrame:
    """Read everything the idempotent sink has committed. ``basePath``
    anchors partition discovery so the batch=N layer and any dt=
    partition layer below it both resolve as partition columns."""
    return (
        spark.read.option("basePath", path)
        .parquet(os.path.join(path, "batch=*"))
        .drop("batch")
    )


def reset_sink(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)
