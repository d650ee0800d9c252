"""Streaming-semantics tests (SURVEY §5 strategy 3): file source +
Trigger.AvailableNow + foreachBatch, pinning the behaviors the
reference implements with Redis sidecars — cross-batch dedup,
late-arrival stream-stream join, offset restore, idempotent replay.

``maxFilesPerTrigger=1`` makes each fixture file its own micro-batch,
so "cross-batch" is real keyed-state behavior, not within-batch
dedup."""

from __future__ import annotations

import json
import os

import pytest

from sparkstreaming_realtime_spark.streaming import (
    file_stream,
    idempotent_parquet_sink,
    kafka_sink_options,
    kafka_stream_options,
    streaming_dau_dedup,
    streaming_order_wide,
)
from sparkstreaming_realtime_spark.streaming.pipelines import run_available_now
from sparkstreaming_realtime_spark.streaming.sinks import read_sink

PAGE_SCHEMA = (
    "mid string, last_page_id string, page_id string, event_time timestamp"
)


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(df, sink_fn, checkpoint):
    q = run_available_now(df, sink_fn, checkpoint)
    q.awaitTermination(120)
    assert not q.isActive


def test_dedup_across_micro_batches(spark, tmp_path):
    """T2: a mid seen in batch 1 must be suppressed in batch 2 (same
    day) — the Redis sismember/sadd semantics via keyed state — while
    the same mid on ANOTHER day passes (per-day scope)."""
    src = str(tmp_path / "src")
    _write_jsonl(f"{src}/b1.json", [
        {"mid": "m1", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 08:00:00"},
        {"mid": "m2", "last_page_id": "home", "page_id": "cart",
         "event_time": "2024-01-01 08:01:00"},  # not a session entry
    ])
    _write_jsonl(f"{src}/b2.json", [
        {"mid": "m1", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 09:00:00"},  # dup within day → drop
        {"mid": "m1", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-02 08:00:00"},  # next day → new row
        {"mid": "m3", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 10:00:00"},
    ])
    stream = file_stream(spark, src, PAGE_SCHEMA, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    _drain(streaming_dau_dedup(stream),
           idempotent_parquet_sink(out, key_cols=("mid", "dt")),
           str(tmp_path / "ckpt"))
    # dt comes back as DateType via partition-column inference
    got = sorted(
        (r["mid"], str(r["dt"])) for r in read_sink(spark, out).collect()
    )
    assert got == [("m1", "2024-01-01"), ("m1", "2024-01-02"),
                   ("m3", "2024-01-01")]


INFO_SCHEMA = "id long, user_id long, total_amount double, event_time timestamp"
DETAIL_SCHEMA = (
    "id long, order_id long, sku_id long, order_price double,"
    " event_time timestamp"
)


def test_order_join_matches_across_batches(spark, tmp_path):
    """J3/T3: info arriving in batch 1 joins a detail arriving only in
    batch 2 (the Redis cache-then-match path, DwdOrderApp.scala:183-232),
    1:N preserved."""
    isrc, dsrc = str(tmp_path / "info"), str(tmp_path / "detail")
    _write_jsonl(f"{isrc}/b1.json", [
        {"id": 1, "user_id": 10, "total_amount": 99.0,
         "event_time": "2024-01-01 08:00:00"},
    ])
    _write_jsonl(f"{dsrc}/b1.json", [
        {"id": 101, "order_id": 1, "sku_id": 7, "order_price": 49.5,
         "event_time": "2024-01-01 08:00:05"},
    ])
    _write_jsonl(f"{dsrc}/b2.json", [
        {"id": 102, "order_id": 1, "sku_id": 8, "order_price": 49.5,
         "event_time": "2024-01-01 08:10:00"},  # late second detail
        {"id": 103, "order_id": 2, "sku_id": 9, "order_price": 5.0,
         "event_time": "2024-01-01 08:11:00"},  # info never arrives
    ])
    joined = streaming_order_wide(
        file_stream(spark, isrc, INFO_SCHEMA, max_files_per_trigger=1),
        file_stream(spark, dsrc, DETAIL_SCHEMA, max_files_per_trigger=1),
    )
    out = str(tmp_path / "out")
    _drain(joined, idempotent_parquet_sink(out, key_cols=("detail_id",),
                                           partition_col=None),
           str(tmp_path / "ckpt"))
    rows = read_sink(spark, out).collect()
    got = sorted((r["order_id"], r["detail_id"], r["sku_id"]) for r in rows)
    # both details of order 1 joined; orphan detail 103 not emitted
    assert got == [(1, 101, 7), (1, 102, 8)]
    assert {r["total_amount"] for r in rows} == {99.0}


def test_checkpoint_restores_offsets(spark, tmp_path):
    """S3/S4/K10: a second run over the same checkpoint must process
    ONLY newly arrived data — offset restore/commit with no replay,
    the MyOffsetUtils contract, for free."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_jsonl(f"{src}/b1.json", [
        {"mid": "m1", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 08:00:00"}])
    sink = idempotent_parquet_sink(out, key_cols=("mid", "dt"))
    _drain(streaming_dau_dedup(file_stream(spark, src, PAGE_SCHEMA)), sink, ckpt)
    n_after_first = read_sink(spark, out).count()
    # restart with one new file: only it is processed (and state
    # survives: m1 on the same day stays deduped)
    _write_jsonl(f"{src}/b2.json", [
        {"mid": "m1", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 09:00:00"},
        {"mid": "m9", "last_page_id": None, "page_id": "home",
         "event_time": "2024-01-01 09:01:00"}])
    _drain(streaming_dau_dedup(file_stream(spark, src, PAGE_SCHEMA)), sink, ckpt)
    got = sorted(
        (r["mid"], str(r["dt"])) for r in read_sink(spark, out).collect()
    )
    assert n_after_first == 1
    assert got == [("m1", "2024-01-01"), ("m9", "2024-01-01")]


def test_idempotent_sink_replay_overwrites(spark, tmp_path):
    """T5: replaying the same batch id must not duplicate output —
    the engine analog of ES doc-id overwrites (MyEsUtils.scala:47)."""
    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out, key_cols=("k",), partition_col=None)
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)], "k string, v int")
    sink(df, batch_id=7)
    sink(df, batch_id=7)  # replay
    rows = read_sink(spark, out).collect()
    assert sorted(r["k"] for r in rows) == ["a", "b"]  # batch-dedup + overwrite


def test_kafka_option_builders():
    """S1/S2/K1: option-level coverage for the Kafka source/sink (no
    broker in this environment; shapes match the reference configs,
    MykafkaUtils.scala:19-36,84-94)."""
    src = kafka_stream_options("ODS_BASE_LOG", "g1", "broker:9092")
    assert src["subscribe"] == "ODS_BASE_LOG"
    assert src["startingOffsets"] == "latest"
    explicit = kafka_stream_options(
        "t", "g", starting_offsets='{"t":{"0":42}}')
    assert explicit["startingOffsets"] == '{"t":{"0":42}}'
    snk = kafka_sink_options("DWD_PAGE_LOG_TOPIC", "broker:9092")
    assert snk["topic"] == "DWD_PAGE_LOG_TOPIC"
