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
        # events.parquet has shipped as TIMESTAMP(NANOS) (needs this
        # runtime-settable conf) and as plain timestamp[us] (reads as
        # TIMESTAMP_NTZ in Spark 4). Callers may hand us an arbitrary
        # session (the driver harness does), so set both confs
        # defensively here, not only in session.get_spark(). The UTC
        # pin makes the NTZ→TIMESTAMP cast in events_with_ts
        # value-preserving, matching DuckDB's naive-epoch oracle math.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = events_with_ts(df)
    return df


def events_with_ts(events: DataFrame) -> DataFrame:
    """Normalize the events table's ts to TimestampType regardless of
    how the parquet encoded it (nanos-as-long, native micros, or
    TIMESTAMP_NTZ). Dispatch on the actual schema — never assume the
    driver's data shape."""
    dt = events.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # integer div — double division would lose precision on
        # 1.7e18-scale nano values (53-bit mantissa)
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(dt, T.TimestampNTZType):
        # Spark 4 reads plain parquet timestamp[us] as TIMESTAMP_NTZ;
        # unix_millis & co. reject NTZ. With the session tz pinned UTC
        # (read_table) this cast is value-preserving and the DuckDB
        # oracle (epoch_ms on the naive value) agrees.
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events
