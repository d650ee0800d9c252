"""Opt-in integration test against a REAL Kafka broker (S1/S2/K1/K2
transport — the one surface the sandbox cannot exercise; reference:
``util/MykafkaUtils.scala:41-94``).

Skips cleanly unless ``KAFKA_BOOTSTRAP`` is set. To run it, follow
README "Production Kafka binding" verbatim:

    docker run -d -p 9092:9092 apache/kafka:3.7.0
    KAFKA_BOOTSTRAP=localhost:9092 \
        python -m pytest tests/test_kafka_integration.py -q

Run this file STANDALONE: the session needs the
``spark-sql-kafka-0-10`` connector package on the JVM classpath,
which must be configured before the first SparkSession in the
process starts (the shared suite session doesn't carry it).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=<host:port> to run the real-broker "
    "integration test (see README 'Production Kafka binding')",
)

PAGE_SCHEMA = (
    "mid string, last_page_id string, page_id string, event_time timestamp"
)

#: the cross-batch dedup fixture of test_streaming.py, verbatim — the
#: broker run must produce byte-identical output to the file-source run
ROWS = [
    {"mid": "m1", "last_page_id": None, "page_id": "home",
     "event_time": "2024-01-01 08:00:00"},
    {"mid": "m2", "last_page_id": "home", "page_id": "cart",
     "event_time": "2024-01-01 08:01:00"},  # not a session entry
    {"mid": "m1", "last_page_id": None, "page_id": "home",
     "event_time": "2024-01-01 09:00:00"},  # dup within day → drop
    {"mid": "m1", "last_page_id": None, "page_id": "home",
     "event_time": "2024-01-02 08:00:00"},  # next day → new row
    {"mid": "m3", "last_page_id": None, "page_id": "home",
     "event_time": "2024-01-01 10:00:00"},
]


@pytest.fixture(scope="module")
def kspark():
    import pyspark
    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        pytest.skip(
            "kafka integration needs a fresh JVM with the connector "
            "package — run tests/test_kafka_integration.py standalone"
        )
    pkg = (
        "org.apache.spark:spark-sql-kafka-0-10_2.13:"
        + pyspark.__version__
    )
    s = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _dau_pipeline(stream_df):
    """Typed page-log → session-entry filter + cross-batch daily
    dedup — the exact production binding from the README recipe."""
    from pyspark.sql import functions as F

    from sparkstreaming_realtime_spark.streaming import streaming_dau_dedup

    typed = stream_df.select(
        F.from_json(F.col("value"), PAGE_SCHEMA).alias("r")
    ).select("r.*")
    return streaming_dau_dedup(typed)


def test_kafka_roundtrip_matches_file_source(kspark, tmp_path):
    """Produce the DAU fixture through a real broker with the
    engine's producer options (idempotence+acks, K1/K2), consume it
    with kafka_stream (S1/S2), run the dedup pipeline, and require
    byte-identical output to the same pipeline over the bounded file
    source — transport must not change semantics."""
    from pyspark.sql import functions as F

    from sparkstreaming_realtime_spark.streaming import (
        file_stream,
        idempotent_parquet_sink,
        kafka_sink_options,
    )
    from sparkstreaming_realtime_spark.streaming.pipelines import (
        run_available_now,
    )
    from sparkstreaming_realtime_spark.streaming.sinks import read_sink
    from sparkstreaming_realtime_spark.streaming.sources import kafka_stream

    topic = f"it_page_log_{uuid.uuid4().hex[:8]}"

    # K1/K2: keyed batch produce through the engine's producer options
    payload = kspark.createDataFrame(
        [(r["mid"], json.dumps(r)) for r in ROWS], "key string, value string"
    )
    (
        payload.write.format("kafka")
        .options(**kafka_sink_options(topic, BOOTSTRAP))
        .save()
    )

    # S1/S2: consume from the earliest offset (cold start), drain with
    # AvailableNow, offsets committed in the checkpoint (S3/S4/K10)
    raw = kafka_stream(
        kspark, topic, group_id=f"g_{topic}",
        bootstrap_servers=BOOTSTRAP, starting_offsets="earliest",
    )
    out_k = str(tmp_path / "out_kafka")
    qk = run_available_now(
        _dau_pipeline(raw),
        idempotent_parquet_sink(out_k, key_cols=("mid", "dt")),
        str(tmp_path / "ckpt_kafka"),
        query_name="kafka_dau",
    )
    qk.awaitTermination(120)
    assert not qk.isActive

    # the same rows through the bounded file source
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(f"{src}/b1.json", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    out_f = str(tmp_path / "out_file")
    qf = run_available_now(
        _dau_pipeline(
            file_stream(kspark, src, PAGE_SCHEMA).select(
                F.to_json(F.struct("*")).alias("value")
            )
        ),
        idempotent_parquet_sink(out_f, key_cols=("mid", "dt")),
        str(tmp_path / "ckpt_file"),
        query_name="file_dau",
    )
    qf.awaitTermination(120)
    assert not qf.isActive

    def rows(path):
        return sorted(
            (r["mid"], str(r["dt"]), str(r["event_time"]))
            for r in read_sink(kspark, path).collect()
        )

    got_k, got_f = rows(out_k), rows(out_f)
    assert got_k == got_f
    assert [(m, d) for m, d, _ in got_k] == [
        ("m1", "2024-01-01"), ("m1", "2024-01-02"), ("m3", "2024-01-01")
    ]
