"""Log-split operator family (SURVEY P3–P9): the ODS_BASE_LOG envelope
fan-out of ``OdsBaseLogApp.scala:88-198`` as declarative DataFrame
transforms.

Reference behavior: one Kafka topic of nested JSON, split per record
into five outputs — error (whole record when ``err`` present,
:97-101), PageLog (``common`` ⊕ ``page`` with renames, :117-130),
PageDisplayLog (one row per ``displays[]`` element, :133-151),
PageActionLog (one row per ``actions[]`` element, :153-168), StartLog
(``common`` ⊕ ``start``, :170-184).

Engine shape: ``from_json(ODS_BASE_LOG_SCHEMA)`` once, then five
filter/select/explode branches off the parsed frame — Catalyst prunes
the struct fields each branch touches, and a multi-sink run scans the
source once under ``foreachBatch``/``persist``. ``explode`` replaces
the hand-rolled per-element loops; everything stays in codegen.

The driver's test tables have no envelope column, so
:func:`synthesize_ods_log` derives one deterministically from the
flat ``events`` table (pure modular arithmetic on its columns). The
DuckDB oracles recompute each output *directly* from events — the
Spark path must survive its extra ``to_json → from_json`` round-trip
to agree, which is exactly the parsing behavior under test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import ODS_BASE_LOG_SCHEMA

#: top-level envelope fields each split branch actually touches —
#: parsing with the pruned subset makes Jackson skip the other
#: subtrees entirely (Catalyst's own json pruning does not reach
#: through the pushdown-duplicated filter copies, so we prune by hand).
BRANCH_FIELDS: dict[str, frozenset[str]] = {
    "error": frozenset({"common", "err", "ts"}),
    "page": frozenset({"common", "page", "err", "ts"}),
    "display": frozenset({"common", "page", "displays", "err", "ts"}),
    "action": frozenset({"common", "page", "actions", "err", "ts"}),
    "start": frozenset({"common", "start", "err", "ts"}),
}


def _s(c: Column) -> Column:
    return c.cast("string")


def synthesize_ods_log(events: DataFrame) -> DataFrame:
    """Deterministic ODS_BASE_LOG JSON envelope per event row.

    event_type drives the shape (like real traffic does): ``error`` →
    err block only; ``view`` → page; ``click`` → page + displays[];
    ``purchase`` → page + actions[]; anything else (``signup``) →
    start block. All field values are modular functions of
    (event_id, user_id, value, ts) so both engines derive them
    exactly."""
    uid, eid = F.col("user_id"), F.col("event_id")
    et = F.col("event_type")
    millis = F.unix_millis("ts")

    common = F.struct(
        _s(uid % 34 + 1).alias("ar"),
        _s(uid).alias("uid"),
        F.when(uid % 2 == 0, "Android").otherwise("iOS").alias("os"),
        F.concat(F.lit("ch_"), _s(uid % 5)).alias("ch"),
        _s(uid % 2).alias("is_new"),
        F.concat(F.lit("model_"), _s(uid % 7)).alias("md"),
        F.concat(F.lit("mid_"), _s(uid)).alias("mid"),
        F.concat(F.lit("v"), _s(uid % 3)).alias("vc"),
        F.concat(F.lit("brand_"), _s(uid % 6)).alias("ba"),
    )
    page = F.struct(
        F.concat(F.lit("page_"), _s(eid % 10)).alias("page_id"),
        _s(eid % 100).alias("item"),
        F.lit("sku_id").alias("item_type"),
        F.floor(F.col("value") * 1000).cast("long").alias("during_time"),
        F.when(eid % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("page_"), _s(eid % 7)))
        .alias("last_page_id"),
        F.concat(F.lit("src_"), _s(eid % 4)).alias("source_type"),
    )
    displays = F.transform(
        F.sequence(F.lit(0), (eid % 3).cast("int")),
        lambda i: F.struct(
            F.when((eid + i) % 2 == 0, "promotion").otherwise("query")
            .alias("display_type"),
            _s((eid + i) % 50).alias("item"),
            F.lit("sku_id").alias("item_type"),
            _s(i + 1).alias("pos_id"),
            _s(i + 1).alias("order"),
        ),
    )
    actions = F.transform(
        F.sequence(F.lit(0), (eid % 2).cast("int")),
        lambda i: F.struct(
            F.concat(F.lit("action_"), _s((eid + i) % 5)).alias("action_id"),
            _s((eid + i) % 50).alias("item"),
            F.lit("sku_id").alias("item_type"),
            (millis + i).alias("ts"),
        ),
    )
    start = F.struct(
        F.when(eid % 2 == 0, "icon").otherwise("notice").alias("entry"),
        F.floor(F.col("value") * 10).cast("long").alias("open_ad_skip_ms"),
        F.floor(F.col("value") * 100).cast("long").alias("open_ad_ms"),
        F.floor(F.col("value") * 50).cast("long").alias("loading_time"),
        _s(eid % 20).alias("open_ad_id"),
    )
    has_page = et.isin("view", "click", "purchase")
    envelope = F.struct(
        common.alias("common"),
        F.when(has_page, page).alias("page"),
        F.when(et == "click", displays).alias("displays"),
        F.when(et == "purchase", actions).alias("actions"),
        F.when(et == "signup", start).alias("start"),
        F.when(et == "error", F.concat(F.lit("err_"), _s(eid % 5))).alias("err"),
        millis.alias("ts"),
    )
    return events.select(F.to_json(envelope).alias("value"))


def parse_ods_log(
    raw: DataFrame, col: str = "value", branch: str | None = None
) -> DataFrame:
    """P1/P2: ONE typed parse of the envelope per row (replaces per-row
    fastjson access, OdsBaseLogApp.scala:62-69).

    Two deliberate plan shapes:

    - ``explode(array(from_json(...)))`` — a 1:1 Generate. Catalyst
      pushes the split branches' filters through a plain Project,
      re-instantiating ``from_json`` inside the Filter (the JSON text
      would be parsed up to 3× per row); predicates do NOT push through
      a Generate's own output attribute, so the barrier pins exactly
      one parse. Measured 10× on the page branch at sf0.1.
    - ``branch=`` prunes the parse schema to the top-level fields that
      branch touches (:data:`BRANCH_FIELDS`) — Jackson skips the other
      subtrees token-wise instead of converting them.
    """
    schema = ODS_BASE_LOG_SCHEMA
    if branch is not None:
        keep = BRANCH_FIELDS[branch]
        schema = StructType(
            [f for f in ODS_BASE_LOG_SCHEMA.fields if f.name in keep]
        )
    parsed = F.from_json(F.col(col), schema)
    return raw.select(F.explode(F.array(parsed)).alias("j"))


def _common_cols() -> list[Column]:
    """P4/P5's renames (OdsBaseLogApp.scala:117-130): ar→province_id,
    ba→brand, md→model, os→operate_system, vc→version_code,
    ch→channel, uid→user_id."""
    j = F.col("j")
    return [
        j["common"]["mid"].alias("mid"),
        j["common"]["uid"].alias("user_id"),
        j["common"]["ar"].alias("province_id"),
        j["common"]["ch"].alias("channel"),
        j["common"]["is_new"].alias("is_new"),
        j["common"]["md"].alias("model"),
        j["common"]["os"].alias("operate_system"),
        j["common"]["vc"].alias("version_code"),
        j["common"]["ba"].alias("brand"),
    ]


def _page_cols() -> list[Column]:
    j = F.col("j")
    return [
        j["page"]["page_id"].alias("page_id"),
        j["page"]["last_page_id"].alias("last_page_id"),
        j["page"]["item"].alias("page_item"),
        j["page"]["item_type"].alias("page_item_type"),
        j["page"]["during_time"].alias("during_time"),
        j["page"]["source_type"].alias("sourceType"),
    ]


def split_error(parsed: DataFrame) -> DataFrame:
    """P3: err-present records route whole to the error sink
    (OdsBaseLogApp.scala:97-101)."""
    j = F.col("j")
    return parsed.filter(j["err"].isNotNull()).select(
        j["common"]["mid"].alias("mid"),
        j["err"].alias("err"),
        j["ts"].alias("ts"),
    )


def split_page(parsed: DataFrame) -> DataFrame:
    """P5: PageLog projection+renames for non-error page records
    (OdsBaseLogApp.scala:117-130)."""
    j = F.col("j")
    return parsed.filter(
        j["err"].isNull() & j["page"]["page_id"].isNotNull()
    ).select(*_common_cols(), *_page_cols(), j["ts"].alias("ts"))


def split_displays(parsed: DataFrame) -> DataFrame:
    """P6: one PageDisplayLog row per displays[] element
    (OdsBaseLogApp.scala:133-151) — explode, not a per-row loop."""
    j = F.col("j")
    return (
        parsed.filter(j["err"].isNull() & (F.size(j["displays"]) > 0))
        .select(*_common_cols(), *_page_cols(), j["ts"].alias("ts"),
                F.explode(j["displays"]).alias("d"))
        .select(
            "mid", "user_id", "province_id", "channel", "is_new", "model",
            "operate_system", "version_code", "brand",
            "page_id", "last_page_id", "page_item", "page_item_type",
            "during_time", "sourceType",
            F.col("d.display_type").alias("display_type"),
            F.col("d.item").alias("display_item"),
            F.col("d.item_type").alias("display_item_type"),
            F.col("d.order").alias("display_order"),
            F.col("d.pos_id").alias("display_pos_id"),
            "ts",
        )
    )


def split_actions(parsed: DataFrame) -> DataFrame:
    """P7: one PageActionLog row per actions[] element
    (OdsBaseLogApp.scala:153-168)."""
    j = F.col("j")
    return (
        parsed.filter(j["err"].isNull() & (F.size(j["actions"]) > 0))
        .select(*_common_cols(), *_page_cols(), j["ts"].alias("ts"),
                F.explode(j["actions"]).alias("a"))
        .select(
            "mid", "user_id", "province_id", "channel", "is_new", "model",
            "operate_system", "version_code", "brand",
            "page_id", "last_page_id", "page_item", "page_item_type",
            "during_time", "sourceType",
            F.col("a.action_id").alias("action_id"),
            F.col("a.item").alias("action_item"),
            F.col("a.item_type").alias("action_item_type"),
            F.col("a.ts").alias("action_ts"),
            "ts",
        )
    )


def split_start(parsed: DataFrame) -> DataFrame:
    """P8: StartLog projection (OdsBaseLogApp.scala:170-184)."""
    j = F.col("j")
    return parsed.filter(
        j["err"].isNull() & j["start"]["entry"].isNotNull()
    ).select(
        *_common_cols(),
        j["start"]["entry"].alias("entry"),
        j["start"]["open_ad_id"].alias("open_ad_id"),
        j["start"]["loading_time"].alias("loading_time_ms"),
        j["start"]["open_ad_ms"].alias("open_ad_ms"),
        j["start"]["open_ad_skip_ms"].alias("open_ad_skip_ms"),
        j["ts"].alias("ts"),
    )


def log_split(raw: DataFrame, col: str = "value") -> dict[str, DataFrame]:
    """P9: the full 1→5 multiplex — five branches, each parsing the
    envelope once with its branch-pruned schema. In a streaming run
    each branch is a sink inside one foreachBatch over a persisted
    batch DF (single source scan, OdsBaseLogApp.scala:88); the persist
    is what amortizes the source read, while the pruned parses keep
    each branch's CPU proportional to the fields it ships."""
    return {
        "error": split_error(parse_ods_log(raw, col, branch="error")),
        "page": split_page(parse_ods_log(raw, col, branch="page")),
        "display": split_displays(parse_ods_log(raw, col, branch="display")),
        "action": split_actions(parse_ods_log(raw, col, branch="action")),
        "start": split_start(parse_ods_log(raw, col, branch="start")),
    }
