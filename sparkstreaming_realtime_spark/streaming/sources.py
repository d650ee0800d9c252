"""Streaming sources (SURVEY S1–S4).

The reference hand-rolls Kafka consumption: explicit offset restore
from a Redis hash (``MyOffsetUtils.scala:47-63``), per-batch offset
capture via ``HasOffsetRanges`` (``OdsBaseLogApp.scala:51-55``), and
write-then-commit ordering (K10). Structured Streaming's checkpoint
subsumes all four operators: offsets are restored on restart, ranges
tracked per batch, and committed after the sink epoch — the
``test_checkpoint_restores_offsets`` test pins that S3/S4/K10
behavior.

Kafka itself is not runnable in this container, so
:func:`kafka_stream` is exercised at the option-construction level
(unit-tested) while :func:`file_stream` provides the bounded,
deterministic source the pipeline tests run on — the transforms are
source-agnostic DataFrames either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_stream_options(
    topic: str,
    group_id: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """S1/S2: the full consumer config of ``MykafkaUtils.scala:19-36``
    mapped onto the Structured Streaming Kafka source.

    - ``bootstrap.servers`` / topic subscribe / ``group.id`` map 1:1
      (``:21-24,33``).
    - key/value ``StringDeserializer`` (``:25-26``): built in — the
      source exposes ``binary`` key/value; :func:`kafka_stream` casts
      to string.
    - ``auto.offset.reset = latest`` (``:28``): ``startingOffsets=
      'latest'`` when no explicit offsets are passed; an offsets JSON
      (``{"topic":{"0":1234}}``) covers the reference's
      cold-start-from-stored-offsets path (``:55-64``) — warm
      restarts get offsets from the checkpoint instead (S3).
    - ``enable.auto.commit = false`` + manual commit-after-write
      (``:30-35``, ``MyOffsetUtils.scala:20-36``): the source NEVER
      uses Kafka-committed offsets for progress — the checkpoint is
      the offset store, committed after each sink epoch (K10), which
      is exactly the reference's write-then-commit ordering.
    - ``max_offsets_per_trigger``: per-micro-batch rate cap — the
      production knob the reference lacks (its 5 s batches take
      whatever arrived); set it so one micro-batch's work fits the
      trigger interval at peak ingest.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets or "latest",
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession, topic: str, group_id: str, **kw
) -> DataFrame:
    """S1/S2: Kafka source → (key, value) string columns, the same
    shape the reference's ConsumerRecord[String,String] stream has
    (MykafkaUtils.scala:41-64)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(topic, group_id, **kw).items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("kafka_ts"),
    )


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Bounded test source: JSON-lines files under ``path``.
    ``max_files_per_trigger=1`` makes each file its own micro-batch,
    which is how the tests exercise *cross-batch* state (dedup/join
    buffers) without a broker."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)
