"""Structured Streaming surface — the engine's replacement for the
reference's four DStream apps and their Redis sidecar state.

Mapping (SURVEY §1.5, §2.9):

- Kafka direct stream + Redis offset store (S1–S4,
  ``MykafkaUtils.scala:41-64``, ``MyOffsetUtils.scala:20-63``) →
  ``readStream.format("kafka")`` + **checkpointLocation** (offset
  restore/commit is the checkpoint, built in — sources.py).
- Redis ``DAU:<date>`` dedup set with no expiry
  (``DwdDauApp.scala:83-100`` — leaks forever) → watermarked
  ``dropDuplicates`` keyed state with eviction (pipelines.py).
- 24 h Redis join cache choreography (``DwdOrderApp.scala:165-237``)
  → watermarked stream-stream inner join; Spark's symmetric state
  store IS that buffer-and-match, with correct late/TTL semantics.
- Per-partition Kafka producer + flush (K1–K3) → Kafka sink epochs;
  ES bulk doc-id idempotent write (K5, ``MyEsUtils.scala:41-52``) →
  deterministic per-batch overwrite in ``foreachBatch`` (sinks.py).
- 5 s / 2 s batch triggers (T1) → ``trigger(processingTime=...)``;
  tests use ``Trigger.AvailableNow`` for bounded runs.
"""

from .pipelines import (
    run_available_now,
    run_processing_time,
    streaming_dau_dedup,
    streaming_order_wide,
    with_batch_metrics,
)
from .sinks import (
    bm25_index_sink,
    dim_upsert_sink,
    funnel_sink,
    idempotent_parquet_sink,
    ivf_append_sink,
    kafka_sink_options,
    quality_gate_sink,
    read_bm25_index,
    read_dim_snapshot,
    read_funnel,
    read_retention,
    retention_sink,
    read_rollup_sum,
    read_scd2,
    read_transition,
    rollup_sum_sink,
    scd2_sink,
    transition_sink,
)
from .sources import file_stream, kafka_stream, kafka_stream_options

__all__ = [
    "streaming_dau_dedup",
    "streaming_order_wide",
    "with_batch_metrics",
    "run_available_now",
    "run_processing_time",
    "idempotent_parquet_sink",
    "dim_upsert_sink",
    "scd2_sink",
    "ivf_append_sink",
    "quality_gate_sink",
    "funnel_sink",
    "transition_sink",
    "rollup_sum_sink",
    "bm25_index_sink",
    "retention_sink",
    "read_dim_snapshot",
    "read_funnel",
    "read_retention",
    "read_transition",
    "read_rollup_sum",
    "read_scd2",
    "read_bm25_index",
    "kafka_sink_options",
    "file_stream",
    "kafka_stream",
    "kafka_stream_options",
]
