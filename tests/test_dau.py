"""Unit tests for the DAU pipeline operators (SURVEY §3.2) on tiny
hand-built frames pinning the reference's observable semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_realtime_spark.operators.dau import (
    dau_realtime,
    dau_rows,
    dedup_first_daily,
    enrich_dims,
    session_entries,
)

PAGE_ROWS = [
    # mid, user_id, province_id, last_page_id, ts (epoch millis)
    ("mid_1", "1", "1", None, 1654826400000),   # 2022-06-10 02:00 entry
    ("mid_1", "1", "1", "home", 1654827000000), # not an entry
    ("mid_1", "1", "1", None, 1654830000000),   # same day dup entry
    ("mid_1", "1", "1", None, 1654912800000),   # next day → counts again
    ("mid_2", "2", "2", None, 1654826460000),
]
PAGE_SCHEMA = "mid string, user_id string, province_id string, last_page_id string, ts long"


def _page_log(spark):
    return spark.createDataFrame(PAGE_ROWS, PAGE_SCHEMA)


def test_session_entries_filter(spark):
    out = session_entries(_page_log(spark))
    assert out.count() == 4  # drops the last_page_id='home' row


def test_dedup_first_daily_keeps_first_per_day(spark):
    out = dedup_first_daily(session_entries(_page_log(spark)), key="mid", ts="ts")
    rows = {(r.mid, r.dt): r.ts for r in out.collect()}
    # mid_1 deduped to its first entry on 06-10, counted again on 06-11
    assert rows[("mid_1", "2022-06-10")] == 1654826400000
    assert ("mid_1", "2022-06-11") in rows
    assert len(rows) == 3


def test_enrich_dims_broadcast_join(spark):
    users = spark.createDataFrame(
        [(1, "F", "2000-06-15"), (2, "M", "1990-01-01")],
        "id long, gender string, birthday string",
    )
    provinces = spark.createDataFrame(
        [(1, "Beijing", "110", "CN-11", "CN-BJ")],
        "id long, name string, area_code string, iso_code string, iso_3166_2 string",
    )
    out = enrich_dims(
        _page_log(spark), users, provinces, as_of="2022-06-12"
    ).collect()
    entries = sorted(
        (r for r in out if r.last_page_id is None), key=lambda r: (r.mid, r.ts)
    )
    by_mid = {}
    for r in entries:
        by_mid.setdefault(r.mid, r)
    r1 = by_mid["mid_1"]
    assert (r1.user_gender, r1.user_age, r1.province_name) == ("F", 21, "Beijing")
    r2 = by_mid["mid_2"]
    assert r2.user_gender == "M" and r2.province_name is None  # left join

    # the dim side must be broadcast, not shuffled (scale contract)
    plan = enrich_dims(
        _page_log(spark), users, provinces, as_of="2022-06-12"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dau_realtime_counts(spark):
    users = spark.createDataFrame([], "id long, gender string, birthday string")
    provinces = spark.createDataFrame(
        [], "id long, name string, area_code string, iso_code string, iso_3166_2 string"
    )
    table = dau_rows(_page_log(spark), users, provinces, as_of="2022-06-12")
    res = dau_realtime(table, "2022-06-11")
    assert res["dauTotal"].collect()[0].dau_total == 1
    yd = {r.hr: r.ct for r in res["dauYd"].collect()}
    assert sum(yd.values()) == 2  # mid_1 + mid_2 on 06-10
