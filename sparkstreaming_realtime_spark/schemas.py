"""Schema registry — every reference bean and JSON envelope as a
``StructType``.

The reference uses fastjson ``JSONObject`` for the raw edge and Scala
case classes afterwards (SURVEY §1.4): ``PageLog``
(``bean/PageLog.scala:3-20``), ``PageDisplayLog``
(``bean/PageDisplayLog.scala:3-25``), ``PageActionLog``
(``bean/PageActionLog.scala:3-24``), ``StartLog``
(``bean/StartLog.scala:3-19``), ``DauInfo`` (``bean/DauInfo.scala:3-32``),
``OrderInfo`` (``bean/OrderInfo.scala:3-29``), ``OrderDetail``
(``bean/OrderDetail.scala:3-14``), ``OrderWide``
(``bean/OrderWide.scala:5-41``).

Here each bean is a named ``StructType``; the raw envelopes are typed
structs with array fan-out fields so ``from_json`` + ``explode``
replace per-row fastjson access (``OdsBaseLogApp.scala:97-184``).
Money stays ``DoubleType`` to match the reference
(``OrderInfo.scala:8-13``) — a production fork would use
``DecimalType(16,2)``.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _fields(pairs: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in pairs])


S = T.StringType()
L = T.LongType()
D = T.DoubleType()

# --- raw envelopes -------------------------------------------------------

#: ``ODS_BASE_LOG`` envelope (OdsBaseLogApp.scala:97-184; FIXTURES.md §1)
COMMON_SCHEMA = _fields(
    [("ar", S), ("uid", S), ("os", S), ("ch", S), ("is_new", S),
     ("md", S), ("mid", S), ("vc", S), ("ba", S)]
)
PAGE_SCHEMA = _fields(
    [("page_id", S), ("item", S), ("item_type", S), ("during_time", L),
     ("last_page_id", S), ("source_type", S)]
)
DISPLAY_SCHEMA = _fields(
    [("display_type", S), ("item", S), ("item_type", S), ("pos_id", S), ("order", S)]
)
ACTION_SCHEMA = _fields(
    [("action_id", S), ("item", S), ("item_type", S), ("ts", L)]
)
START_SCHEMA = _fields(
    [("entry", S), ("open_ad_skip_ms", L), ("open_ad_ms", L),
     ("loading_time", L), ("open_ad_id", S)]
)
ODS_BASE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("common", COMMON_SCHEMA, True),
        T.StructField("page", PAGE_SCHEMA, True),
        T.StructField("displays", T.ArrayType(DISPLAY_SCHEMA), True),
        T.StructField("actions", T.ArrayType(ACTION_SCHEMA), True),
        T.StructField("start", START_SCHEMA, True),
        # presence alone routes the record to the error topic
        # (OdsBaseLogApp.scala:97-100) — keep as raw string so any shape passes
        T.StructField("err", S, True),
        T.StructField("ts", L, True),
    ]
)

#: Maxwell-style CDC envelope, topic ``ODS_BASE_DB``
#: (OdsBaseDbApp.scala:100-128; FIXTURES.md §2). ``data`` is kept as a
#: raw JSON string because its schema depends on ``table``; per-table
#: parsing applies the right bean schema downstream.
ODS_BASE_DB_SCHEMA = _fields([("type", S), ("table", S)]).add(
    T.StructField("data", S, True)
)

# --- DWD beans -----------------------------------------------------------

_PAGELOG_FIELDS: list[tuple[str, T.DataType]] = [
    ("mid", S), ("user_id", S), ("province_id", S), ("channel", S),
    ("is_new", S), ("model", S), ("operate_system", S), ("version_code", S),
    ("brand", S),
    ("page_id", S), ("last_page_id", S), ("page_item", S),
    ("page_item_type", S), ("during_time", L), ("sourceType", S),
    ("ts", L),
]
#: bean/PageLog.scala:3-20 — note the renames applied at
#: OdsBaseLogApp.scala:127-128: ar→province_id, ba→brand, md→model,
#: os→operate_system, vc→version_code, ch→channel, uid→user_id.
PAGE_LOG_SCHEMA = _fields(_PAGELOG_FIELDS)

#: bean/PageDisplayLog.scala:3-25 — PageLog ⊕ one displays[] element.
PAGE_DISPLAY_LOG_SCHEMA = _fields(
    _PAGELOG_FIELDS[:-1]
    + [("display_type", S), ("display_item", S), ("display_item_type", S),
       ("display_order", S), ("display_pos_id", S), ("ts", L)]
)

#: bean/PageActionLog.scala:3-24 — PageLog ⊕ one actions[] element.
PAGE_ACTION_LOG_SCHEMA = _fields(
    _PAGELOG_FIELDS[:-1]
    + [("action_id", S), ("action_item", S), ("action_item_type", S),
       ("action_ts", L), ("ts", L)]
)

#: bean/StartLog.scala:3-19 — common ⊕ start block.
START_LOG_SCHEMA = _fields(
    [("mid", S), ("user_id", S), ("province_id", S), ("channel", S),
     ("is_new", S), ("model", S), ("operate_system", S), ("version_code", S),
     ("brand", S),
     ("entry", S), ("open_ad_id", S), ("loading_time_ms", L),
     ("open_ad_ms", L), ("open_ad_skip_ms", L), ("ts", L)]
)

#: bean/DauInfo.scala:3-32 — PageLog minus last_page_id, plus user and
#: province dims and derived dt/hr.
DAU_INFO_SCHEMA = _fields(
    [(n, t) for n, t in _PAGELOG_FIELDS if n != "last_page_id"]
    + [("user_gender", S), ("user_age", S),
       ("province_name", S), ("province_iso_code", S),
       ("province_3166_2", S), ("province_area_code", S),
       ("dt", S), ("hr", S)]
)

#: bean/OrderInfo.scala:3-29 — ids long, money Double, times as strings.
ORDER_INFO_SCHEMA = _fields(
    [("id", L), ("province_id", L), ("order_status", S), ("user_id", L),
     ("total_amount", D), ("activity_reduce_amount", D),
     ("coupon_reduce_amount", D), ("original_total_amount", D),
     ("feight_fee", D), ("feight_fee_reduce", D),
     ("expire_time", S), ("refundable_time", S), ("create_time", S),
     ("operate_time", S),
     # enrichment columns (filled by the dim joins)
     ("create_date", S), ("create_hour", S),
     ("user_gender", S), ("user_age", T.IntegerType()),
     ("province_name", S), ("province_area_code", S),
     ("province_3166_2", S), ("province_iso_code", S)]
)

#: bean/OrderDetail.scala:3-14.
ORDER_DETAIL_SCHEMA = _fields(
    [("id", L), ("order_id", L), ("sku_id", L), ("sku_name", S),
     ("order_price", D), ("sku_num", L), ("create_time", S),
     ("split_total_amount", D), ("split_activity_amount", D),
     ("split_coupon_amount", D)]
)

#: bean/OrderWide.scala:5-41 — detail ⊕ info ⊕ dims. In DataFrame land
#: the reflective bean merge (util/MyBeanUtils.scala:14-46) is just a
#: column-name union; see streaming/pipelines.py:streaming_order_wide
#: (stream-stream) and plans/queries.py:order_wide_join (batch).
ORDER_WIDE_DETAIL_COLS = [
    "detail_id", "order_id", "sku_id", "sku_name", "order_price", "sku_num",
    "split_total_amount", "split_activity_amount", "split_coupon_amount",
]
ORDER_WIDE_INFO_COLS = [
    "province_id", "order_status", "user_id", "total_amount",
    "activity_reduce_amount", "coupon_reduce_amount",
    "original_total_amount", "feight_fee", "feight_fee_reduce",
    "expire_time", "refundable_time", "create_time", "operate_time",
    "create_date", "create_hour",
    "user_gender", "user_age",
    "province_name", "province_area_code", "province_3166_2",
    "province_iso_code",
]

#: dim tables maintained by the CDC path (FIXTURES.md §3-4;
#: OdsBaseDbApp.scala:128-139 stores them as DIM:<TABLE>:<id> JSON).
USER_INFO_SCHEMA = _fields([("id", L), ("gender", S), ("birthday", S)])
BASE_PROVINCE_SCHEMA = _fields(
    [("id", L), ("name", S), ("area_code", S), ("iso_code", S), ("iso_3166_2", S)]
)

#: query-result row (publish-realtime/.../bean/NameValue.java:11-14)
NAME_VALUE_SCHEMA = _fields([("name", S), ("value", D)])

REGISTRY: dict[str, T.StructType] = {
    "ods_base_log": ODS_BASE_LOG_SCHEMA,
    "ods_base_db": ODS_BASE_DB_SCHEMA,
    "page_log": PAGE_LOG_SCHEMA,
    "page_display_log": PAGE_DISPLAY_LOG_SCHEMA,
    "page_action_log": PAGE_ACTION_LOG_SCHEMA,
    "start_log": START_LOG_SCHEMA,
    "dau_info": DAU_INFO_SCHEMA,
    "order_info": ORDER_INFO_SCHEMA,
    "order_detail": ORDER_DETAIL_SCHEMA,
    "user_info": USER_INFO_SCHEMA,
    "base_province": BASE_PROVINCE_SCHEMA,
    "name_value": NAME_VALUE_SCHEMA,
}
