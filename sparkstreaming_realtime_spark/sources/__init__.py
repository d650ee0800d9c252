"""Source helpers: batch parquet/json readers and (gated) Kafka
readStream builders (SURVEY §2.1)."""

from .files import events_with_ts, read_table

__all__ = ["events_with_ts", "read_table"]
