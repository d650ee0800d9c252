"""Batch source helpers (parquet warehouse tables). Streaming
sources — Kafka builders and the file test source — live in
``..streaming.sources`` (SURVEY §2.1)."""

from .files import events_with_ts, read_table

__all__ = ["events_with_ts", "read_table"]
