"""Unit tests for the CDC split + dim snapshot
(OdsBaseDbApp.scala:58-141 semantics)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreaming_realtime_spark.operators import cdc


def _cdc_rows(spark, rows):
    """rows: (type, table, data_dict, ts_ms, seq)"""
    data = [
        (json.dumps({"type": t, "table": tb, "data": json.dumps(d)}), ts, seq)
        for t, tb, d, ts, seq in rows
    ]
    raw = spark.createDataFrame(data, "value string, ts_ms long, event_id long")
    from sparkstreaming_realtime_spark.schemas import ODS_BASE_DB_SCHEMA

    return raw.select(
        F.from_json("value", ODS_BASE_DB_SCHEMA).alias("j"), "ts_ms", "event_id"
    ).select(
        F.col("j.type").alias("type"), F.col("j.table").alias("table"),
        F.col("j.data").alias("data"), "ts_ms", "event_id",
    )


def test_normalize_op_correct_delete_mapping(spark):
    df = _cdc_rows(
        spark,
        [
            ("bootstrap-insert", "user_info", {"id": 1}, 1, 1),
            ("insert", "user_info", {"id": 2}, 2, 2),
            ("update", "user_info", {"id": 1}, 3, 3),
            ("delete", "user_info", {"id": 2}, 4, 4),
            ("weird", "user_info", {"id": 3}, 5, 5),  # dropped
        ],
    )
    ops = [r["op"] for r in cdc.normalize_op(df).orderBy("event_id").collect()]
    # the reference's dead-code bug maps delete unreachably; we fix it
    assert ops == ["I", "I", "U", "D"]


def test_route_label_fact_dim_drop(spark):
    df = cdc.normalize_op(
        _cdc_rows(
            spark,
            [
                ("insert", "order_info", {"id": 1}, 1, 1),
                ("update", "user_info", {"id": 1}, 2, 2),
                ("insert", "comment_info", {"id": 1}, 3, 3),
            ],
        )
    )
    got = [r["r"] for r in
           df.select(cdc.route_label("table", "op").alias("r"))
           .orderBy("r").collect()]
    assert got == ["drop", "kafka:DWD_ORDER_INFO_I", "redis:DIM:USER_INFO"]


def test_dim_snapshot_last_write_wins_and_tombstone(spark):
    df = cdc.normalize_op(
        _cdc_rows(
            spark,
            [
                ("insert", "user_info", {"id": 1, "v": 10}, 100, 1),
                ("update", "user_info", {"id": 1, "v": 20}, 200, 2),
                # same ts as above → seq breaks the tie
                ("update", "user_info", {"id": 1, "v": 30}, 200, 3),
                ("insert", "user_info", {"id": 2, "v": 5}, 100, 4),
                ("delete", "user_info", {"id": 2, "v": 5}, 300, 5),
            ],
        )
    )
    snap = cdc.dim_snapshot(cdc.route_dims(df), ord_cols=("ts_ms", "event_id"))
    rows = {r["id"]: json.loads(r["data"]) for r in snap.collect()}
    assert rows == {"1": {"id": 1, "v": 30}}  # id 2 tombstoned


def test_fact_rows_kafka_shape(spark):
    df = cdc.normalize_op(
        _cdc_rows(spark, [("insert", "order_detail", {"id": 7, "v": 1}, 1, 1)])
    )
    r = cdc.route_facts(df).collect()[0]
    assert r["topic"] == "kafka:DWD_ORDER_DETAIL_I"
    assert r["key"] == "7"
    assert json.loads(r["value"])["id"] == 7


def test_route_with_config_is_dynamic(spark):
    """P13: routing follows the config table — reclassifying a table
    from fact to dim changes its route with no code change (the
    per-batch re-read-and-broadcast of OdsBaseDbApp.scala:80-93)."""
    df = cdc.normalize_op(
        _cdc_rows(spark, [("insert", "order_info", {"id": 1}, 1, 1)])
    )
    cfg_fact = spark.createDataFrame(
        [("order_info", "fact")], "table string, kind string")
    cfg_dim = spark.createDataFrame(
        [("order_info", "dim")], "table string, kind string")
    cfg_absent = spark.createDataFrame(
        [("other", "fact")], "table string, kind string")
    r1 = cdc.route_with_config(df, cfg_fact).collect()[0]["route"]
    r2 = cdc.route_with_config(df, cfg_dim).collect()[0]["route"]
    r3 = cdc.route_with_config(df, cfg_absent).collect()[0]["route"]
    assert r1 == "kafka:DWD_ORDER_INFO_I"
    assert r2 == "redis:DIM:ORDER_INFO"
    assert r3 == "drop"


def test_scd2_intervals_partition_time_per_key(spark):
    """SCD2 invariants on a messy changelog (out-of-order build input,
    same-ts writes, deletes, reinserts): per key, versions sort by
    valid_from with each valid_to equal to the NEXT write's ts (any
    op), exactly one open version unless the last write was a delete,
    and version numbers strictly increase."""
    from sparkstreaming_realtime_spark.operators.cdc import scd2_history

    rows = [
        # key 1: I, U, same-ts U (event_id breaks tie), D, re-I
        ("user_info", '{"id":1,"v":1}', "I", 100, 1),
        ("user_info", '{"id":1,"v":2}', "U", 200, 2),
        ("user_info", '{"id":1,"v":3}', "U", 200, 3),
        ("user_info", '{"id":1,"v":0}', "D", 300, 4),
        ("user_info", '{"id":1,"v":4}', "I", 400, 5),
        # key 2: single insert, stays open
        ("user_info", '{"id":2,"v":9}', "I", 150, 6),
    ]
    df = spark.createDataFrame(
        rows, "table string, data string, op string, ts_ms long, event_id long"
    )
    hist = sorted(
        (
            (r["id"], r["version"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in scd2_history(df).collect()
        )
    )
    assert hist == [
        ("1", 1, 100, 200, 0),
        ("1", 2, 200, 200, 0),   # zero-length: superseded same-ts
        ("1", 3, 200, 300, 0),   # closed by the delete
        ("1", 5, 400, None, 1),  # reinsert reopens (version 4 = the D)
        ("2", 1, 150, None, 1),
    ]


def test_snapshot_diff_classifies_all_states(spark):
    from sparkstreaming_realtime_spark.operators.cdc import (
        snapshot_diff,
        snapshot_diff_summary,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "k long, s string, v long",
    )
    per_key = {
        r.k: r.status
        for r in snapshot_diff(old, new, ("k",), ("s", "v")).collect()
    }
    assert per_key == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under null-safe equality
        4: "removed",
        5: "added",
    }
    summary = {
        r.status: r.n
        for r in snapshot_diff_summary(
            old, new, ("k",), ("s", "v")
        ).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_to_value_is_changed(spark):
    from sparkstreaming_realtime_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    assert snapshot_diff(old, new, ("k",), ("v",)).collect()[0].status == (
        "changed"
    )
