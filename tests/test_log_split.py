"""Unit tests for the log-split family on hand-built envelope JSON —
pins routing, renames, explode fan-out, and error precedence against
the reference semantics (OdsBaseLogApp.scala:88-198)."""

from __future__ import annotations

import json

from sparkstreaming_realtime_spark.operators import log_split as ls

COMMON = {
    "ar": "3", "uid": "42", "os": "iOS", "ch": "web", "is_new": "1",
    "md": "m1", "mid": "mid_42", "vc": "v2", "ba": "apple",
}


def _raw(spark, objs):
    return spark.createDataFrame(
        [(json.dumps(o),) for o in objs], "value string"
    )


def _fixture(spark):
    return _raw(
        spark,
        [
            # page-only record, null last_page_id (session entry)
            {"common": COMMON,
             "page": {"page_id": "home", "item": "7", "item_type": "sku_id",
                      "during_time": 1200, "source_type": "ad"},
             "ts": 1000},
            # page + two displays + one action
            {"common": COMMON,
             "page": {"page_id": "good_detail", "item": "9",
                      "item_type": "sku_id", "during_time": 800,
                      "last_page_id": "home", "source_type": "query"},
             "displays": [
                 {"display_type": "promo", "item": "1", "item_type": "sku_id",
                  "pos_id": "1", "order": "1"},
                 {"display_type": "query", "item": "2", "item_type": "sku_id",
                  "pos_id": "2", "order": "2"},
             ],
             "actions": [
                 {"action_id": "cart_add", "item": "9", "item_type": "sku_id",
                  "ts": 1500}],
             "ts": 2000},
            # start record
            {"common": COMMON,
             "start": {"entry": "icon", "open_ad_skip_ms": 0, "open_ad_ms": 5000,
                       "loading_time": 300, "open_ad_id": "ad9"},
             "ts": 3000},
            # error record THAT ALSO has a page block — err wins, whole
            # record routes to error only (reference `if err != null`)
            {"common": COMMON,
             "page": {"page_id": "cart", "item": "1", "item_type": "sku_id",
                      "during_time": 10, "source_type": "x"},
             "err": "boom",
             "ts": 4000},
        ],
    )


def test_split_routes_disjoint_and_error_wins(spark):
    out = ls.log_split(_fixture(spark))
    assert out["error"].count() == 1
    assert out["page"].count() == 2          # error-page excluded
    assert out["display"].count() == 2       # exploded
    assert out["action"].count() == 1
    assert out["start"].count() == 1
    err = out["error"].collect()[0]
    assert err["err"] == "boom" and err["ts"] == 4000


def test_page_renames_match_reference(spark):
    rows = {r["ts"]: r for r in ls.log_split(_fixture(spark))["page"].collect()}
    r = rows[1000]
    # OdsBaseLogApp.scala:127-128 rename table
    assert r["province_id"] == "3"      # ar
    assert r["user_id"] == "42"         # uid
    assert r["operate_system"] == "iOS"  # os
    assert r["channel"] == "web"        # ch
    assert r["model"] == "m1"           # md
    assert r["version_code"] == "v2"    # vc
    assert r["brand"] == "apple"        # ba
    assert r["last_page_id"] is None and r["sourceType"] == "ad"
    assert r["during_time"] == 1200


def test_display_explode_carries_page_context(spark):
    got = sorted(
        (r["display_order"], r["display_item"], r["page_id"])
        for r in ls.log_split(_fixture(spark))["display"].collect()
    )
    assert got == [("1", "1", "good_detail"), ("2", "2", "good_detail")]


def test_action_explode_fields(spark):
    r = ls.log_split(_fixture(spark))["action"].collect()[0]
    assert (r["action_id"], r["action_item"], r["action_ts"], r["ts"]) == (
        "cart_add", "9", 1500, 2000,
    )


def test_start_projection(spark):
    r = ls.log_split(_fixture(spark))["start"].collect()[0]
    assert (r["entry"], r["open_ad_id"], r["loading_time_ms"],
            r["open_ad_ms"], r["open_ad_skip_ms"]) == ("icon", "ad9", 300, 5000, 0)


def test_malformed_json_does_not_crash_split(spark):
    """Permissive parse: a malformed record yields nulls and falls out
    of every branch rather than failing the job."""
    raw = spark.createDataFrame([("{not json",), ("42",)], "value string")
    out = ls.log_split(raw)
    assert all(df.count() == 0 for df in out.values())
