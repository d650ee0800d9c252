"""Batch source helpers (parquet warehouse tables). Streaming
sources — Kafka builders and the file test source — live in
``..streaming.sources`` (SURVEY §2.1)."""

from .files import events_with_ts, read_table
from .warehouse import (
    compact_partitions,
    partition_values,
    read_warehouse,
    write_bucketed,
    write_clustered,
    write_warehouse,
    write_zordered,
)

__all__ = [
    "events_with_ts",
    "read_table",
    "read_warehouse",
    "write_warehouse",
    "write_bucketed",
    "write_clustered",
    "write_zordered",
    "compact_partitions",
    "partition_values",
]
