"""Batch file sources.

The reference's only batch "source" is Redis point reads; its stream
sources are Kafka (SURVEY §2.1). The engine's warehouse is parquet,
so this module owns the two data-shape quirks of the driver tables:

- ``events.parquet`` stores ``ts`` as parquet ``TIMESTAMP(NANOS)``,
  which Spark only reads via ``spark.sql.legacy.parquet.nanosAsLong``
  (set in session.py). :func:`events_with_ts` converts the bigint
  nanos back to a proper timestamp (floor to micros — exactly what
  DuckDB's micro-resolution TIMESTAMP does, so oracles agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS); vanilla Spark
        # rejects it unless this (runtime-settable) conf is on. Callers
        # may hand us an arbitrary session (the driver harness does),
        # so set it defensively here, not only in session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = events_with_ts(df)
    return df


def events_with_ts(events: DataFrame) -> DataFrame:
    """Normalize the events table's ts to TimestampType regardless of
    how the parquet encoded it (nanos-as-long vs native)."""
    if isinstance(events.schema["ts"].dataType, T.LongType):
        # integer div — double division would lose precision on
        # 1.7e18-scale nano values (53-bit mantissa)
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return events
