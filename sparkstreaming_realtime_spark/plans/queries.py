"""Query registry — every implemented operator from SURVEY §2 as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle SQL
string over the same parquet tables.

Conventions (driver contract, __spark_entry__.py):
- every computed column is aliased identically in Spark and SQL;
- money/float aggregates are rounded (2dp for money, 6dp for ratios)
  on BOTH sides so cross-engine float-summation order can't flip the
  value hash;
- counts are cast to bigint on both sides (DuckDB ``sum(int)`` would
  otherwise widen to HUGEINT);
- any LIMIT/top-k query carries a full deterministic ORDER BY
  (unique tie-break key) on both sides.

The queries run the *operator implementations* from ``..operators``
and ``..functions`` wherever one exists — this file is the thin
binding between those operators, the driver's test tables, and the
oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import match_all_terms
from ..operators.dau import dedup_first_daily


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a registry query so entering it first unpersists the
    engine-materialized frames of PREVIOUS queries (already collected
    by any sequential harness — driver gate, bench, check_oracle).
    Leaked blocks measurably degrade the tail of a 94-query session;
    unpersist is perf-only (persist is recomputable) so this is safe
    even for a harness that interleaves builds and collects."""
    import functools

    from ..materialize import release_all

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_all()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _released(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.files import read_table

    return read_table(spark, sf_dir, name)


def _stream_t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.files import stream_table

    return stream_table(spark, sf_dir, name)


# deterministic money aggregation (see functions/money.py for the
# rationale and the shared Spark/DuckDB integer-cents contract);
# module-local aliases keep the 30+ oracle f-strings below readable
from ..functions.money import money_sum as _money_sum  # noqa: E402
from ..functions.money import oracle_money_sum_sql as _money_sum_sql  # noqa: E402


# ---------------------------------------------------------------------------
# DAU / dedup surface (SURVEY A1, A2, T2, P12) — `events` plays the page-log
# stream: user_id≈mid, ts≈epoch ts, event_type≈page_id.
# ---------------------------------------------------------------------------


@register(
    "dau_total_by_day",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(DISTINCT user_id)::BIGINT AS dau_total
    FROM events GROUP BY 1
    """,
    tags=("A1", "T2"),
)
def dau_total_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: total deduped actives per day (PublishDaoImpl.java:156-176 —
    COUNT of the per-day ES index whose doc-id=mid makes it distinct
    by construction)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id")
        .distinct()
        .groupBy("dt")
        .agg(F.count("*").cast("bigint").alias("dau_total"))
    )


@register(
    "dau_by_hour",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hr,
           count(DISTINCT user_id)::BIGINT AS ct
    FROM events GROUP BY 1, 2
    """,
    tags=("A2",),
)
def dau_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: deduped actives per (day, hour) — the ES terms-agg on
    hr.keyword (PublishDaoImpl.java:122-154)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            F.date_format("ts", "HH").alias("hr"),
            "user_id",
        )
        .distinct()
        .groupBy("dt", "hr")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )


@register(
    "session_entry_first_daily",
    oracle="""
    SELECT dt, user_id, event_id AS first_event_id
    FROM (
      SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id, event_id,
             row_number() OVER (
               PARTITION BY strftime(ts, '%Y-%m-%d'), user_id
               ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'view'
    ) WHERE rn = 1
    """,
    tags=("T2", "P12"),
)
def session_entry_first_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+P12: session-entry filter then first-record-per-(dt,key)
    dedup — the exact cross-batch Redis-set semantics of
    DwdDauApp.scala:69-100, deterministic tiebreak on event_id."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    out = dedup_first_daily(ev, key="user_id", ts="ts", tiebreak="event_id")
    return out.select("dt", "user_id", F.col("event_id").alias("first_event_id"))


@register(
    "dau_warehouse_day_slice",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hr,
           count(DISTINCT user_id)::BIGINT AS ct
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') =
          (SELECT max(strftime(ts, '%Y-%m-%d')) FROM events)
    GROUP BY 1, 2
    """,
    tags=("A2", "K5", "warehouse"),
)
def dau_warehouse_day_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES-per-day-index analog END-TO-END: materialize the DAU
    rows through ``sources.warehouse.write_warehouse`` partitioned by
    dt (the engine's ``gmall_day_info_<date>``, DwdDauApp.scala:177),
    then serve a single day back OUT of the warehouse — the read
    carries ``dt = <day>`` so the scan prunes to one partition
    directory, exactly the per-day index selection the reference does
    by string-building an index name. The day is data-derived (max dt
    present) so the query is deterministic; values are oracle-checked
    against the base table, proving the round-trip loses nothing.
    Pruning itself is plan-pinned by
    tests/test_warehouse.py::test_partition_pruning_skips_other_days."""
    from ..materialize import engine_tmpdir

    from ..sources.warehouse import (
        partition_values,
        read_warehouse,
        write_warehouse,
    )

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        F.date_format("ts", "HH").alias("hr"),
        "user_id",
    ).distinct()
    path = engine_tmpdir("dau_wh_")
    write_warehouse(rows, path, partition_by=("dt",))
    wh = read_warehouse(spark, path)
    # the "serving" read: one day (the endpoint's `td` request param,
    # here data-derived for determinism), pruned at the source. The
    # served day comes from the warehouse's partition DIRECTORY
    # listing — FileStatus metadata, not a second full scan of events
    # (the r3-flagged double-scan). The partition column reads back
    # type-inferred (DATE for yyyy-MM-dd values); filter BEFORE the
    # to-string cast so pruning stays static, then normalize to the
    # oracle's string dt.
    target = max(partition_values(spark, path, "dt"))
    return (
        wh.filter(F.col("dt") == target)
        .withColumn("dt", F.date_format("dt", "yyyy-MM-dd"))
        .groupBy("dt", "hr")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )


@register(
    "clustered_point_lookup",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n,
           sum(floor("value" * 100)::BIGINT)::BIGINT AS cents
    FROM events WHERE user_id = (SELECT min(user_id) FROM events)
    GROUP BY event_type
    """,
    tags=("extension", "warehouse", "clustering"),
)
def clustered_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping layout END-TO-END: events written range-clustered
    on user_id (``sources.warehouse.write_clustered`` —
    repartitionByRange + sortWithinPartitions), then a selective key
    lookup served OUT of the clustered table. Each file/row-group
    carries a tight disjoint [min, max] of the key, so the parquet
    reader's stats filter skips everything but one file — the
    high-cardinality answer to "index this column" where a partition
    directory per value would be wrong. Stats disjointness is pinned
    by tests/test_warehouse.py::
    test_clustered_write_produces_disjoint_file_stats; the oracle
    proves the re-layout loses nothing. The lookup key is
    min(user_id) — a key GUARANTEED present at every SF (a fixed
    literal made the parity vacuously-empty at sf0.001; pinned
    non-empty by tests/test_warehouse.py) — collected as a scalar so
    the filter is a literal predicate the parquet reader's row-group
    stats can act on (a scalar-subquery join would defeat the
    file-skipping this query demonstrates)."""
    from ..materialize import engine_tmpdir

    from ..sources.warehouse import write_clustered

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    path = engine_tmpdir("ev_clustered_")
    write_clustered(ev, path, cluster_by=("user_id",), n_files=8)
    target = ev.agg(F.min("user_id")).collect()[0][0]
    return (
        spark.read.parquet(path)
        .filter(F.col("user_id") == target)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


@register(
    "events_quality_expectations",
    oracle="""
    SELECT 'not_null:user_id' AS check,
           round(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS metric,
           0.0::DOUBLE AS threshold,
           (sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
            / count(*)::DOUBLE <= 0.0)::INT AS passed
    FROM events
    UNION ALL
    SELECT 'unique:event_id',
           round((count(event_id) - count(DISTINCT event_id))::DOUBLE, 6),
           0.0::DOUBLE,
           (count(event_id) - count(DISTINCT event_id) <= 0)::INT
    FROM events
    UNION ALL
    SELECT 'accepted_values:event_type',
           round(sum(CASE WHEN event_type IN
                     ('view','click','purchase','signup','error')
                     THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6),
           0.99::DOUBLE,
           (sum(CASE WHEN event_type IN
                ('view','click','purchase','signup','error')
                THEN 1 ELSE 0 END) / count(*)::DOUBLE >= 0.99)::INT
    FROM events
    UNION ALL
    SELECT 'between:value',
           round(sum(CASE WHEN "value" IS NOT NULL
                     AND NOT ("value" BETWEEN 0 AND 1000000)
                     THEN 1 ELSE 0 END)::DOUBLE, 6),
           0.0::DOUBLE,
           (sum(CASE WHEN "value" IS NOT NULL
                AND NOT ("value" BETWEEN 0 AND 1000000)
                THEN 1 ELSE 0 END) <= 0)::INT
    FROM events
    UNION ALL
    SELECT 'row_count', round(count(*)::DOUBLE, 6), 100.0::DOUBLE,
           (count(*) BETWEEN 100 AND 1000000000)::INT
    FROM events
    UNION ALL
    SELECT 'fk:user_id', round(count(*)::DOUBLE, 6), 0.0::DOUBLE,
           (count(*) <= 0)::INT
    FROM (SELECT e.user_id FROM events e
          WHERE e.user_id IS NOT NULL
            AND e.user_id NOT IN (SELECT c_custkey FROM customer))
    """,
    tags=("extension", "quality", "expectations"),
)
def events_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/expectations.py —
    the Deequ/Great-Expectations shape): five expectations compiled
    into ONE conditional-aggregate scan plus a broadcast anti-join
    referential check, returned as the (check, metric, threshold,
    passed) verdict frame a pipeline gates on before training."""
    from ..operators.expectations import (
        check_expectations,
        check_foreign_key,
    )

    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    suite = check_expectations(
        ev,
        [
            ("not_null", "user_id", 0.0),
            ("unique", "event_id"),
            (
                "accepted_values",
                "event_type",
                ("view", "click", "purchase", "signup", "error"),
                0.99,
            ),
            ("between", "value", 0, 1_000_000),
            ("row_count", 100, 1_000_000_000),
        ],
    )
    fk = check_foreign_key(ev, "user_id", c, "c_custkey")
    return suite.unionByName(fk)


@register(
    "streaming_quality_gate_parity",
    oracle="""
    SELECT 'accepted' AS side, event_type, count(*)::BIGINT AS ct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'quarantined', event_type, count(*)::BIGINT
    FROM events GROUP BY event_type
    """,
    tags=("extension", "quality", "streaming"),
)
def streaming_quality_gate_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming quality gate end-to-end under the batch oracle
    (streaming/sinks.py:quality_gate_sink): the events table streams
    through TWO gates — one whose suite every micro-batch passes
    (event_id is never null), one whose suite every non-empty batch
    fails (a row_count window of [0, 0]) — so regardless of how the
    source batches, gate one must land EVERY row in accepted/ and
    gate two must quarantine EVERY row whole. The returned frame is
    both destinations re-aggregated by event type; losing, splitting,
    or misrouting any batch shifts a count and breaks the hash. The
    per-check verdict values are separately under the driver gate via
    events_quality_expectations (same compiler), and quarantine
    replay/empty-batch behavior is pytest-pinned."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import quality_gate_sink

    _t(spark, sf_dir, "events")  # sets the temporal read confs
    root = engine_tmpdir("qgate_parity_")
    for tag, suite in (
        ("pass", [("not_null", "event_id", 0.0)]),
        ("fail", [("row_count", 0, 0)]),
    ):
        raw = _stream_t(spark, sf_dir, "events")
        q = run_available_now(
            raw,
            quality_gate_sink(f"{root}/{tag}", suite),
            checkpoint=f"{root}/ckpt_{tag}",
            query_name="qgate_" + uuid.uuid4().hex[:8],
        )
        q.awaitTermination()
    accepted = (
        spark.read.parquet(f"{root}/pass/accepted")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("ct"))
        .select(F.lit("accepted").alias("side"), "event_type", "ct")
    )
    quarantined = (
        spark.read.parquet(f"{root}/fail/quarantine")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("ct"))
        .select(F.lit("quarantined").alias("side"), "event_type", "ct")
    )
    return accepted.unionByName(quarantined)


@register(
    "streaming_idempotent_sink_parity",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS ct,
           count(DISTINCT event_id)::BIGINT AS n_ids
    FROM events GROUP BY event_type
    """,
    tags=("extension", "streaming", "exactly-once"),
)
def streaming_idempotent_sink_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/K5 end-to-end under the batch oracle
    (streaming/sinks.py:idempotent_parquet_sink — the engine analog
    of the reference's doc-id overwrites, MyEsUtils.scala:41-52 +
    DwdDauApp.scala:167): the events table streams into the
    batch-id-keyed sink, then batch 0 is REPLAYED verbatim through
    the same writer — at-least-once delivery must compose to
    exactly-once output. If a replay appended instead of overwriting,
    every count for the replayed slice doubles and the hash breaks;
    if any batch were lost or split, the per-type counts shift. The
    distinct-id column additionally pins that the sink's in-batch
    key dedup never invents or drops ids. Replay-overwrites and
    the duplicate-key collapse are unit-pinned by
    tests/test_streaming.py (test_idempotent_sink_replay_overwrites);
    this row puts the same writer under the driver's hash gate."""
    import os
    from ..materialize import engine_tmpdir
    import uuid

    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import idempotent_parquet_sink, read_sink

    _t(spark, sf_dir, "events")  # sets the temporal read confs
    root = engine_tmpdir("idem_parity_")
    sink = idempotent_parquet_sink(
        root, key_cols=("event_id",), partition_col=None
    )
    q = run_available_now(
        _stream_t(spark, sf_dir, "events"),
        sink,
        checkpoint=os.path.join(root, "ckpt"),
        query_name="idem_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    # replay epoch 0 exactly as a recovered driver would re-deliver
    # it: same rows, same batch id, same writer
    replay = spark.read.parquet(os.path.join(root, "batch=0"))
    sink(replay, 0)
    return (
        read_sink(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ct"),
            F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        )
    )


@register(
    "streaming_observe_metrics_parity",
    oracle="""
    SELECT 'max_event_s' AS metric, floor(epoch(max(ts)))::BIGINT AS value
    FROM events
    UNION ALL
    SELECT 'min_event_s', floor(epoch(min(ts)))::BIGINT FROM events
    UNION ALL
    SELECT 'n_rows', count(*)::BIGINT FROM events
    UNION ALL
    SELECT 'n_user_null',
           sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM events
    UNION ALL
    SELECT 'sum_value_cents', sum(round("value" * 100)::BIGINT)::BIGINT
    FROM events
    """,
    tags=("extension", "streaming", "observability"),
)
def streaming_observe_metrics_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Dataset.observe`` per-batch metrics under the batch oracle
    (streaming/pipelines.py:with_batch_metrics — the monitoring
    surface the reference lacks): the events table streams through an
    observed plan whose accumulator metrics (row count, null-key
    count, exact money cents, event-time bounds as epoch seconds —
    session TZ is pinned UTC, and ``unix_timestamp`` FLOORS
    sub-second timestamps, so the oracle floors ``epoch`` to match)
    are folded across every micro-batch exactly as a
    metrics exporter would: sums of sums, min of mins, max of maxes.
    The folded totals must equal one batch aggregate over the table —
    a lost batch, a double-counted batch, or an accumulator that
    missed rows shifts a value and breaks the hash. Zero extra scans:
    the metrics ride the batch execution itself."""
    import os
    from ..materialize import engine_tmpdir
    import uuid

    from ..streaming.pipelines import run_available_now, with_batch_metrics

    _t(spark, sf_dir, "events")  # sets the temporal read confs
    observed = with_batch_metrics(
        _stream_t(spark, sf_dir, "events").withColumn(
            "event_time", F.col("ts")
        ),
        name="ev",
        extra={
            "n_user_null": F.sum(F.col("user_id").isNull().cast("bigint")),
            "sum_value_cents": F.sum(
                F.round(F.col("value") * 100).cast("bigint")
            ),
            "min_event_s": F.min(F.unix_timestamp("event_time")),
            "max_event_s": F.max(F.unix_timestamp("event_time")),
        },
    )
    root = engine_tmpdir("observe_parity_")
    q = run_available_now(
        observed,
        lambda df, _bid: df.write.format("noop").mode("overwrite").save(),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="obs_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    n_rows = n_null = cents = 0
    mn = mx = None
    for p in q.recentProgress:
        m = (p.observedMetrics or {}).get("ev")
        if m is None or m["n_rows"] == 0:  # empty trailing batch
            continue
        n_rows += m["n_rows"]
        n_null += m["n_user_null"]
        cents += m["sum_value_cents"]
        mn = m["min_event_s"] if mn is None else min(mn, m["min_event_s"])
        mx = m["max_event_s"] if mx is None else max(mx, m["max_event_s"])
    rows = [
        ("max_event_s", mx),
        ("min_event_s", mn),
        ("n_rows", n_rows),
        ("n_user_null", n_null),
        ("sum_value_cents", cents),
    ]
    return spark.createDataFrame(rows, "metric string, value long")


@register(
    "warehouse_compaction_roundtrip",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*)::BIGINT AS n,
           {_money_sum_sql("value", 2)} AS sum_value
    FROM events WHERE ts < TIMESTAMP '2024-01-08'
    GROUP BY 1
    """,
    tags=("extension", "warehouse", "maintenance"),
)
def warehouse_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction END-TO-END: events land in a
    dt-partitioned warehouse as many tiny files (a day of
    micro-batch sink output), ``compact_partitions`` bin-packs every
    fragmented day to its byte-target file count via the crash-safe
    staged swap, and the day-level aggregate over the compacted
    table must equal the oracle over the raw facts — compaction
    changes bytes and file counts, never rows. File-count reduction
    and cold-partition no-churn are pinned by tests/test_warehouse.py::
    test_compact_partitions_binpacks_hot_days_only."""
    from ..materialize import engine_tmpdir

    from ..sources.warehouse import compact_partitions

    # one week of days: each fragmented day costs a rewrite job, and
    # 7 days exercise the loop as well as 30 would
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            "user_id",
            "value",
        )
    )
    path = engine_tmpdir("ev_compact_")
    # fragment: many small files per day, the streaming-sink shape
    ev.repartition(16).write.mode("overwrite").partitionBy("dt").parquet(path)
    compacted = compact_partitions(spark, path, target_bytes=256 * 1024 * 1024)
    assert compacted, "fixture days should all be fragmented"
    return (
        spark.read.parquet(path)
        .groupBy(F.col("dt").cast("string").alias("dt"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            _money_sum(F.col("value"), 2).alias("sum_value"),
        )
    )


@register(
    "zordered_two_dim_lookup",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n,
           sum(floor("value" * 100)::BIGINT)::BIGINT AS cents
    FROM events
    WHERE user_id BETWEEN (SELECT min(user_id) FROM events)
                      AND (SELECT min(user_id) + 50 FROM events)
      AND "value" BETWEEN 10 AND 50
    GROUP BY event_type
    """,
    tags=("extension", "warehouse", "zorder"),
)
def zordered_two_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping END-TO-END: events written
    Z-ORDERED on (user_id, value) — bit-interleaved Morton key, one
    range exchange (``sources.warehouse.write_zordered``) — then a
    TWO-dimension selective predicate served out of the layout. With
    lexicographic clustering only the leading column's file stats are
    tight; the Morton order keeps every file a tile in BOTH
    dimensions, so the parquet reader's min/max stats prune on each
    predicate independently (what OPTIMIZE ... ZORDER BY buys on a
    table format). Stats tightness on the second dimension is pinned
    by tests/test_warehouse.py::
    test_zordered_write_tightens_stats_on_both_dims; the oracle (the
    plain filter on the unclustered table) proves the re-layout
    changes bytes, not answers. Bounds are data-derived (min user_id)
    so the check is non-vacuous at every SF."""
    from ..materialize import engine_tmpdir

    from ..sources.warehouse import write_zordered

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("value"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    path = engine_tmpdir("ev_zorder_")
    write_zordered(ev, path, cluster_by=("user_id", "value"), n_files=8)
    lo = ev.agg(F.min("user_id")).collect()[0][0]
    return (
        spark.read.parquet(path)
        .filter(F.col("user_id").between(lo, lo + 50))
        .filter(F.col("value").between(10, 50))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


@register(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT o_orderstatus,
           {_money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*)::BIGINT AS n
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("extension", "warehouse", "bucketing"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB repeated-join strategy END-TO-END: both sides
    written hash-bucketed on the join key (``write_bucketed``), then
    joined — bucketing metadata lets the planner skip BOTH shuffles
    (zero Exchange, pinned by tests/test_warehouse.py::
    test_bucketed_join_has_no_exchange), so the shuffle is paid once
    at write time and amortized over every subsequent join. The oracle
    runs the plain join, proving the bucketed layout changes the plan,
    not the answer."""
    import os
    import tempfile

    from ..materialize import track_session_dir
    from ..sources.warehouse import write_bucketed

    # fixed per-session table names + paths, overwritten on every
    # call: repeated invocations (warm-up + timed bench passes) stay
    # bounded at one table pair instead of leaking uuid-named catalog
    # entries and tmpdirs; the applicationId suffix keeps concurrent
    # sessions (parallel gate + bench JVMs) from clobbering each other.
    app = spark.sparkContext.applicationId.replace("-", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_bucketed_{app}")
    track_session_dir(base)
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(
        o, f"orders_bkt_{app}", f"{base}/o",
        bucket_by=("o_orderkey",), n_buckets=8,
    )
    write_bucketed(
        li, f"lineitem_bkt_{app}", f"{base}/l",
        bucket_by=("l_orderkey",), n_buckets=8,
    )
    ob = spark.table(f"orders_bkt_{app}")
    lb = spark.table(f"lineitem_bkt_{app}")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            # exact-integer cents: ~200k doubles per group sum to ~7e9
            # where partition-order float error (~1e-4) could flip the
            # 2-decimal rounding vs DuckDB's sequential sum under AQE
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Routing / split surface (P3, P9, P10, P11, F8)
# ---------------------------------------------------------------------------


@register(
    "error_routing",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt
    FROM events WHERE event_type = 'error'
    """,
    tags=("P3",),
)
def error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: error records split off to their own sink
    (OdsBaseLogApp.scala:97-101)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    )


@register(
    "cdc_op_normalize",
    oracle="""
    SELECT op, count(*)::BIGINT AS n
    FROM (
      SELECT CASE event_type
               WHEN 'signup' THEN 'I' WHEN 'click' THEN 'I'
               WHEN 'view' THEN 'U' WHEN 'purchase' THEN 'U'
               ELSE NULL END AS op
      FROM events
    ) WHERE op IS NOT NULL GROUP BY op
    """,
    tags=("P10",),
)
def cdc_op_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: CDC op-type normalization (OdsBaseDbApp.scala:100-109) —
    map/normalize then drop unknown ops. Implements the *correct*
    delete mapping the reference dead-codes (SURVEY P10 bug note)."""
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin("signup", "click"), "I")
        .when(F.col("event_type").isin("view", "purchase"), "U")
        .otherwise(F.lit(None))
    )
    return (
        ev.select(op.alias("op"))
        .filter(F.col("op").isNotNull())
        .groupBy("op")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "multiplex_route_counts",
    oracle="""
    SELECT CASE event_type
             WHEN 'error' THEN 'DWD_ERROR_LOG_TOPIC'
             WHEN 'view' THEN 'DWD_PAGE_LOG_TOPIC'
             WHEN 'click' THEN 'DWD_PAGE_DISPLAY_TOPIC'
             WHEN 'purchase' THEN 'DWD_PAGE_ACTION_TOPIC'
             ELSE 'DWD_START_LOG_TOPIC' END AS topic,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
    """,
    tags=("P9", "P11"),
)
def multiplex_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P11: 1-source→5-sink multiplex routing
    (OdsBaseLogApp.scala:88-198) — one scan, disjoint route labels."""
    ev = _t(spark, sf_dir, "events")
    topic = (
        F.when(F.col("event_type") == "error", "DWD_ERROR_LOG_TOPIC")
        .when(F.col("event_type") == "view", "DWD_PAGE_LOG_TOPIC")
        .when(F.col("event_type") == "click", "DWD_PAGE_DISPLAY_TOPIC")
        .when(F.col("event_type") == "purchase", "DWD_PAGE_ACTION_TOPIC")
        .otherwise("DWD_START_LOG_TOPIC")
    )
    return ev.groupBy(topic.alias("topic")).agg(
        F.count("*").cast("bigint").alias("n")
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
    """,
    tags=("F8", "P1"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/P1: dynamic JSON field access (fastjson getString,
    OdsBaseLogApp.scala:97-115) as get_json_object over a JSON string
    column."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k_val")
    ).agg(F.count("*").cast("bigint").alias("n"))


# ---------------------------------------------------------------------------
# Time rollups (T6, F1-F3)
# ---------------------------------------------------------------------------


@register(
    "hourly_window_rollup",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*)::BIGINT AS n,
           {_money_sum_sql("value", 2)} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("T6", "F1", "F2"),
)
def hourly_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: tumbling-window hourly rollup — the engine's upgrade of the
    reference's string-split hour bucketing (DwdDauApp.scala:144-149)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            _money_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


@register(
    "sliding_window_rollup",
    oracle=f"""
    WITH assigned AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '30 minutes', ts)
               - i * INTERVAL '30 minutes' AS win_start
      FROM events, range(2) t(i))
    SELECT win_start,
           win_start + INTERVAL '1 hour' AS win_end,
           event_type,
           count(*)::BIGINT AS n,
           {_money_sum_sql("value", 2)} AS sum_value
    FROM assigned GROUP BY 1, 2, 3
    """,
    tags=("T6", "streaming-capable", "extension"),
)
def sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1 h windows every 30 min — each event
    lands in exactly duration/slide = 2 windows): the overlapping
    upgrade of hourly_window_rollup via native
    ``F.window(ts, '1 hour', '30 minutes')``. Spark expands the
    window assignment as a generator in the same stage as the scan
    (no pre-shuffle fan-out materialization), then one partial-agg
    shuffle keyed (window, event_type) — the identical plan runs
    under Structured Streaming with a watermark, which is the point:
    overlapping windows are the standard streaming rollup the
    reference's string-split hour bucketing cannot express. The
    oracle replays the assignment as a range(2) fan-out off the
    30-minute time_bucket (both windows of an event are always
    valid: for s = bucket(ts) and s = bucket(ts)−30 m, ts ∈
    [s, s+1 h) holds by construction)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            _money_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Order wide-table / joins (J1-J5, F10) — orders⋈lineitem plays
# order_info⋈order_detail; customer/nation play the dims.
# ---------------------------------------------------------------------------


@register(
    "order_wide_join",
    oracle="""
    SELECT l.l_orderkey AS order_id,
           l.l_linenumber AS detail_line,
           l.l_partkey AS sku_id,
           round(l.l_extendedprice, 2) AS order_price,
           l.l_quantity AS sku_num,
           o.o_orderstatus AS order_status,
           round(o.o_totalprice, 2) AS total_amount,
           strftime(o.o_orderdate, '%Y-%m-%d') AS create_date,
           o.o_custkey AS user_id,
           c.c_mktsegment AS user_segment,
           n.n_name AS province_name
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    tags=("J1", "J2", "J4", "J5", "F10"),
)
def order_wide_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+J4+J5: the OrderWide build (DwdOrderApp.scala:154-237) as
    declarative joins — detail⋈info on the order key (1:N preserved),
    then broadcast dim enrichment. The reflective bean merge
    (MyBeanUtils.scala:14-46) is the column selection below.

    Join strategy: the big⋈big (lineitem⋈orders) shuffles on the
    order key; ``nation`` (fixed 25 rows) is hint-broadcast;
    ``customer`` SCALES with the data (~15 GB at the 100 TB point) so
    no forced broadcast — AQE picks BHJ while it fits and falls back
    to SMJ beyond (VERDICT r1 #3)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("detail_line"),
            F.col("l_partkey").alias("sku_id"),
            F.round("l_extendedprice", 2).alias("order_price"),
            F.col("l_quantity").alias("sku_num"),
            F.col("o_orderstatus").alias("order_status"),
            F.round("o_totalprice", 2).alias("total_amount"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("create_date"),
            F.col("o_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("user_segment"),
            F.col("n_name").alias("province_name"),
        )
    )


@register(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {_money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    tags=("J2", "A3"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate sanity over the wide table path."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # scales with SF: AQE decides
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


@register(
    "dau_approx_vs_exact",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(DISTINCT user_id)::BIGINT AS dau_exact,
           TRUE AS approx_within_5pct
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("A1", "approx", "extension"),
)
def dau_approx_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 at 100 TB: exact per-day distinct users needs a full shuffle
    of every (dt, user_id) pair; HyperLogLog++
    (``approx_count_distinct``, rsd=2 %) answers the same question from
    a bounded sketch that merges map-side. The query computes BOTH and
    emits the accuracy contract (|approx − exact| / exact ≤ 5 %) as a
    checked column — the oracle pins the exact count and asserts the
    contract holds, so a sketch regression fails the gate."""
    ev = _t(spark, sf_dir, "events")
    per_day = (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id"
        )
        .groupBy("dt")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("dau_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        )
    )
    return per_day.select(
        "dt",
        "dau_exact",
        (
            F.abs(F.col("__approx") - F.col("dau_exact"))
            / F.col("dau_exact")
            <= 0.05
        ).alias("approx_within_5pct"),
    ).orderBy("dt")


@register(
    "streaming_order_wide_parity",
    oracle="""
    SELECT o.o_orderkey AS order_id, o.o_custkey AS user_id,
           round(o.o_totalprice, 2) AS total_amount,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           l.l_orderkey * 10 + l.l_linenumber AS detail_id,
           l.l_partkey AS sku_id,
           round(l.l_extendedprice, 2) AS order_price,
           strftime(l.l_shipdate, '%Y-%m-%d') AS ship_date
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate BETWEEN o.o_orderdate - INTERVAL 24 HOURS
                           AND o.o_orderdate + INTERVAL 24 HOURS
    """,
    tags=("J3", "T3", "streaming"),
)
def streaming_order_wide_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streaming order-wide join (J3/T3: watermarked
    stream-stream inner join with the reference's 24 h TTL as the join
    range bound, DwdOrderApp.scala:165-237) run end-to-end through
    Structured Streaming — file source → symmetric-hash join state →
    AvailableNow drain → memory sink — and oracle-checked against the
    equivalent batch SQL. Orders play order_info (event_time =
    o_orderdate), lineitems play order_detail (event_time =
    l_shipdate), so only ships within 24 h of order placement match:
    the time-bound state pruning is genuinely exercised, not mocked.
    Cross-batch arrival/late-drop behavior is pinned separately by
    tests/test_streaming.py with maxFilesPerTrigger=1."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..streaming.pipelines import streaming_order_wide

    ob = _t(spark, sf_dir, "orders")
    lb = _t(spark, sf_dir, "lineitem")
    so = _stream_t(spark, sf_dir, "orders")
    sl = _stream_t(spark, sf_dir, "lineitem")
    info = so.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("user_id"),
        F.round("o_totalprice", 2).alias("total_amount"),
        # parquet stores NTZ; watermarks require TIMESTAMP_LTZ. The cast
        # shifts both sides identically, so the ±24 h bound and the
        # date_format strings are tz-invariant.
        F.col("o_orderdate").cast("timestamp").alias("event_time"),
    )
    detail = sl.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.round("l_extendedprice", 2).alias("order_price"),
        F.col("l_shipdate").cast("timestamp").alias("event_time"),
    )
    name = "sow_" + uuid.uuid4().hex[:8]
    q = (
        streaming_order_wide(info, detail)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", engine_tmpdir("sow_ckpt_"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "order_id",
        "user_id",
        "total_amount",
        F.date_format("event_time", "yyyy-MM-dd").alias("order_date"),
        "detail_id",
        "sku_id",
        "order_price",
        F.date_format("detail_event_time", "yyyy-MM-dd").alias("ship_date"),
    )


@register(
    "streaming_dau_dedup_parity",
    oracle="""
    SELECT DISTINCT 'mid_' || user_id::VARCHAR AS mid,
           strftime(ts, '%Y-%m-%d') AS dt
    FROM events
    WHERE event_id % 3 = 0
    """,
    tags=("T2", "P12", "streaming"),
)
def streaming_dau_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming DAU dedup (T2: session-entry filter + cross-batch
    first-wins dedup keyed (mid, dt), DwdDauApp.scala:69-100) run
    through real Structured Streaming state — file source →
    watermarked dropDuplicates → AvailableNow → memory sink. Which
    physical row wins per key is arrival-order dependent, so the query
    projects to the (mid, dt) membership set — exactly the information
    the Redis set holds — which IS deterministic and oracle-checkable
    as DISTINCT. The session-entry rule mirrors synthesize_ods_log
    (last_page_id null iff event_id % 3 == 0). Cross-batch admission
    and watermark eviction are pinned by tests/test_streaming.py."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..sources.files import events_with_ts
    from ..streaming.pipelines import streaming_dau_dedup

    eb = _t(spark, sf_dir, "events")  # also sets the nanos conf
    raw = _stream_t(spark, sf_dir, "events")
    page_log = events_with_ts(raw).select(
        F.concat(F.lit("mid_"), F.col("user_id").cast("string")).alias("mid"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("page_"), (F.col("event_id") % 7).cast("string")))
        .alias("last_page_id"),
        F.col("ts").cast("timestamp").alias("event_time"),
    )
    name = "dau_" + uuid.uuid4().hex[:8]
    q = (
        streaming_dau_dedup(page_log)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", engine_tmpdir("dau_ckpt_"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("mid", "dt")


@register(
    "streaming_hourly_rollup_parity",
    oracle=f"""
    SELECT hour_start, event_type, n, sum_value FROM (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start, event_type,
             count(*)::BIGINT AS n, {_money_sum_sql("value", 2)} AS sum_value
      FROM events GROUP BY 1, 2)
    WHERE hour_start + INTERVAL 1 HOUR
          <= (SELECT max(ts) FROM events) - INTERVAL 2 HOURS
    """,
    tags=("T6", "T7", "streaming"),
)
def streaming_hourly_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6/T7 end-to-end: the watermarked tumbling-window rollup run
    through real Structured Streaming (file source → window state →
    AvailableNow → memory sink, append mode). Append emits exactly the
    windows the final watermark (max event time − 2 h lateness) has
    closed — the oracle reproduces that emission rule as
    ``window_end <= max(ts) − 2 h``, so both the aggregation values
    AND the watermark-finalization semantics are under the gate. Late
    drop across batches is pinned by tests/test_streaming.py."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..sources.files import events_with_ts
    from ..streaming.pipelines import streaming_hourly_rollup

    _t(spark, sf_dir, "events")  # sets the nanos read conf
    raw = _stream_t(spark, sf_dir, "events")
    ev = events_with_ts(raw).select(
        F.col("ts").cast("timestamp").alias("event_time"),
        "event_type",
        "value",
    )
    name = "swr_" + uuid.uuid4().hex[:8]
    q = (
        streaming_hourly_rollup(ev)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", engine_tmpdir("swr_ckpt_"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "events_gap_filled_resample",
    oracle=f"""
    WITH a AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS slot, event_type,
             count(*)::BIGINT AS n,
             {_money_sum_sql("value", 2)} AS sum_value
      FROM events GROUP BY 1, 2),
    span AS (SELECT min(slot) AS lo, max(slot) AS hi FROM a),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '15 minutes'))
        AS slot FROM span),
    types AS (SELECT DISTINCT event_type FROM a)
    SELECT g.slot, t.event_type,
           coalesce(a.n, 0)::BIGINT AS n,
           coalesce(a.sum_value, 0.0) AS sum_value
    FROM grid g CROSS JOIN types t
    LEFT JOIN a ON a.slot = g.slot AND a.event_type = t.event_type
    """,
    tags=("T6", "timeseries", "extension"),
)
def events_gap_filled_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with ZERO-FILLED gaps: events bucketed to
    a 15-minute grid per type, then every (slot, type) cell of the
    observed span emitted — quiet intervals as explicit zeros, the
    shape every downstream charting/anomaly job wants. Spark-first
    gap generation: the grid is ``explode(sequence(lo, hi, 15 min))``
    off the aggregate's own 1-row span — no driver-side loop, no
    collect — cross-joined with the (broadcast, ≤|types|) type list,
    LEFT-joining the real aggregate back. Grid size is span-bound,
    independent of event count, so the fill cost never grows with
    data volume."""
    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.window("ts", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _money_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("slot"), "event_type", "n", "sum_value")
    )
    from ..materialize import materialize

    # the aggregate feeds three subtrees (span, types, the join back)
    agg = materialize(agg)
    span = agg.agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
    grid = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 15 MINUTES"))
        ).alias("slot")
    )
    types = agg.select("event_type").distinct()
    return (
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["slot", "event_type"], "left")
        .select(
            "slot",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "streaming_sliding_rollup_parity",
    oracle=f"""
    WITH assigned AS (
      SELECT event_type, value, ts,
             time_bucket(INTERVAL '30 minutes', ts)
               - i * INTERVAL '30 minutes' AS win_start
      FROM events, range(2) t(i))
    SELECT win_start,
           win_start + INTERVAL '1 hour' AS win_end,
           event_type,
           count(*)::BIGINT AS n,
           {_money_sum_sql("value", 2)} AS sum_value
    FROM assigned
    GROUP BY 1, 2, 3
    HAVING win_start + INTERVAL '1 hour'
           <= (SELECT max(ts) FROM events) - INTERVAL 2 HOURS
    """,
    tags=("T6", "T7", "streaming"),
)
def streaming_sliding_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding-window rollup under REAL Structured Streaming
    (streaming/pipelines.py:streaming_sliding_rollup): file source →
    overlapping 1 h/30 min window state → AvailableNow → memory sink,
    append mode. Append emits exactly the windows the final watermark
    (max event time − 2 h) has closed — the oracle replays both the
    2-windows-per-event assignment AND that emission rule, so the
    overlap arithmetic and watermark finalization are driver-hashed
    together (the tumbling twin streaming_hourly_rollup_parity can't
    catch a slide-alignment bug by construction)."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..sources.files import events_with_ts
    from ..streaming.pipelines import streaming_sliding_rollup

    _t(spark, sf_dir, "events")  # sets the nanos read conf
    raw = _stream_t(spark, sf_dir, "events")
    ev = events_with_ts(raw).select(
        F.col("ts").cast("timestamp").alias("event_time"),
        "event_type",
        "value",
    )
    name = "slw_" + uuid.uuid4().hex[:8]
    q = (
        streaming_sliding_rollup(ev)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", engine_tmpdir("slw_ckpt_"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "nation_acctbal_salted",
    oracle=f"""
    SELECT n.n_name AS nation, count(*)::BIGINT AS n_customers,
           {_money_sum_sql("c.c_acctbal", 2)} AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("skew", "extension"),
)
def nation_acctbal_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join as a first-class, oracle-checked operator: every
    nation key is hot by construction (SF-scaling customers over 25 fixed
    keys), the textbook case where a plain shuffle join puts 1/25th of
    100 TB on one reducer. ``salted_join`` spreads each hot key over 8
    salted reducers by replicating the fixed-size side; the oracle is the
    plain join — identical output proves the rewrite is semantics-free.
    (Broadcast solves this case when the engine allows it; salting is the
    fallback for stream-static joins and no-AQE deployments.)"""
    from ..functions.skew import salted_join

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    return (
        salted_join(c, n, on="c_nationkey", salts=8)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            _money_sum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("nation")
    )


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           {_money_sum_sql("l_extendedprice", 2)} AS sum_base_price,
           {_money_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {_money_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A3", "TPCH-Q1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the canonical partial-agg
    (map-side combine) shape the engine must keep fast at 100 TB.
    Money sums go through the integer-cents aggregate (_money_sum —
    base price is a 2-decimal column, disc_price a 4-decimal product,
    charge a 6-decimal product) so the values are independent of
    AQE partition order; quantity is integer-valued, so its double
    sum is already exact."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            _money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
                # decimals=6 means ~1e11 units/row: a bigint
                # accumulator crosses int64 near 1e7-1e8 rows per
                # group (SF>=10) and would fail under ANSI — the
                # charge sum alone pays the decimal accumulator.
                wide=True,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# The ES query surface (A3-A6, O1-O3, F11-F14)
# ---------------------------------------------------------------------------

_ITEM_QUERY = "widget"  # multi-doc match term for p_name (ES match-AND analog)

#: shared by the fact-scan query and its streaming-store parity twin —
#: ONE oracle, two engine paths that must hash-equal it
_STATS_BY_ITEM_ORACLE = rf"""
    SELECT c.c_mktsegment AS segment,
           {_money_sum_sql("l.l_extendedprice", 2)} AS sum_amount
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE list_has_all(
        list_transform(string_split_regex(lower(trim(p.p_name)), '[^\p{{L}}\p{{N}}]+'),
                       x -> x),
        ['{_ITEM_QUERY}'])
    GROUP BY 1
    """


@register(
    "stats_by_item_segment",
    oracle=_STATS_BY_ITEM_ORACLE,
    tags=("A3", "F11"),
)
def stats_by_item_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+F11: the ``GET /statsByItem`` query
    (PublisherServiceImpl.java:31-78): ES match-AND on the item name,
    group by a user dimension, sum the amount measure."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # part and customer scale with SF — no forced broadcast; the match
    # filter on part runs before its join either way (pushdown), and
    # AQE broadcasts the filtered side at runtime while it fits.
    return (
        l.join(p.filter(match_all_terms("p_name", _ITEM_QUERY)),
               l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(_money_sum(F.col("l_extendedprice"), 2).alias("sum_amount"))
    )


@register(
    "streaming_item_stats_parity",
    oracle=_STATS_BY_ITEM_ORACLE,
    tags=("A3", "F11", "serving", "streaming"),
)
def streaming_item_stats_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GET /statsByItem`` the way the reference actually serves it:
    the controller aggregates a MAINTAINED index
    (PublisherServiceImpl.java:31-78 filters+aggs order_wide ES docs,
    milliseconds), it never scans raw facts per request. Here the
    lineitem facts arrive as a real Structured Streaming source in 4
    arbitrary micro-batches, each batch stream-static-joins the dims
    and banks ADDITIVE exact-cents partials at the query-AGNOSTIC
    (p_partkey, p_name, segment, band) grain via ``rollup_sum_sink``
    (deterministic batch=<id> location → replays overwrite, T5; cents
    partials are money_sum's own integer units, so their key-wise sum
    folds to its presentation bit-for-bit). The analyzed match-AND
    and the grouping dimension apply at READ time over the merged
    store (serving.py:stats_by_item_store_frame — parts-table-sized,
    facts never re-read), so one store serves every (itemName, t)
    request and the result must hash-equal the fact-scan
    ``stats_by_item_segment``. The oracle IS its oracle, unchanged."""
    import os
    import uuid

    from ..functions.money import money_units
    from ..materialize import engine_tmpdir
    from ..serving import ITEM_STATS_KEYS, stats_by_item_store_frame
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import rollup_sum_sink

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    root = engine_tmpdir("itemstats_parity_")
    src = os.path.join(root, "src")
    l.select("l_orderkey", "l_partkey", "l_extendedprice").repartition(
        4
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    band = (
        F.when(F.col("c_acctbal") < 2000, "low")
        .when(F.col("c_acctbal") <= 6000, "mid")
        .otherwise("high")
    )
    wide = (
        stream.join(p, stream.l_partkey == p.p_partkey)
        .join(o, stream.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("c_mktsegment").alias("segment"),
            band.alias("band"),
            money_units(F.col("l_extendedprice"), 2).alias("cents"),
        )
    )
    state = os.path.join(root, "state")
    q = run_available_now(
        wide,
        rollup_sum_sink(state, key_cols=ITEM_STATS_KEYS, value_col="cents"),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="itemstats_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return stats_by_item_store_frame(
        spark, state, _ITEM_QUERY, "segment",
        group_alias="segment", amount_alias="sum_amount",
    )


@register(
    "acctbal_bands",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 2000 THEN 'low'
                WHEN c_acctbal <= 6000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*)::BIGINT AS n,
           {_money_sum_sql("c_acctbal", 2)} AS total_bal
    FROM customer GROUP BY 1
    """,
    tags=("A5",),
)
def acctbal_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: client-side re-bucketing (the <20/20-29/>=30 age bands,
    PublisherServiceImpl.java:55-75) done in-engine with when/otherwise."""
    c = _t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 2000, "low")
        .when(F.col("c_acctbal") <= 6000, "mid")
        .otherwise("high")
    )
    return c.groupBy(band.alias("band")).agg(
        F.count("*").cast("bigint").alias("n"),
        _money_sum(F.col("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "relabel_segment",
    oracle="""
    SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 'bldg'
                             WHEN 'AUTOMOBILE' THEN 'auto'
                             ELSE lower(c_mktsegment) END AS label,
           count(*)::BIGINT AS n
    FROM customer GROUP BY 1
    """,
    tags=("A6",),
)
def relabel_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: value re-labeling (gender F→女/M→男,
    PublisherServiceImpl.java:40-54) as a when/otherwise projection."""
    c = _t(spark, sf_dir, "customer")
    label = (
        F.when(F.col("c_mktsegment") == "BUILDING", "bldg")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "auto")
        .otherwise(F.lower("c_mktsegment"))
    )
    return c.groupBy(label.alias("label")).agg(
        F.count("*").cast("bigint").alias("n")
    )


@register(
    "top_k_grouped_avg",
    oracle="""
    SELECT p_brand, round(avg(p_retailprice), 2) AS avg_price,
           count(*)::BIGINT AS n
    FROM part GROUP BY p_brand
    ORDER BY avg_price DESC, p_brand
    LIMIT 10
    """,
    tags=("A4", "O3"),
)
def top_k_grouped_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O3: group-avg ordered by the aggregate, top-k — the ES
    terms-agg with BucketOrder.aggregation (EsTest.scala:119-154)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.count("*").cast("bigint").alias("n"),
        )
        .orderBy(F.desc("avg_price"), F.asc("p_brand"))
        .limit(10)
    )


@register(
    "filtered_sorted_paginated",
    oracle=rf"""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
      WHERE p_retailprice >= 500.0
        AND list_has_all(
          list_transform(string_split_regex(lower(trim(p_name)), '[^\p{{L}}\p{{N}}]+'),
                         x -> x),
          ['{_ITEM_QUERY}'])
    ) WHERE rn > 5 AND rn <= 25
    """,
    tags=("O1", "O2", "F11", "F12", "F14"),
)
def filtered_sorted_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2+F12+F14: bool query (range + match) with sort desc and
    from/size pagination (EsTest.scala:73-113).

    ES ``from(5).size(20)`` is top-25-then-drop-5: take the top 25 via
    ``orderBy().limit(25)`` — TakeOrderedAndProject, per-partition
    partial top-k, no global sort — then number the 25 survivors with
    a window that is trivially single-task *on 25 rows* (VERDICT r1:
    the old unpartitioned window ranked every filtered row in one
    task)."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part")
    top = (
        p.filter(
            (F.col("p_retailprice") >= 500.0)
            & match_all_terms("p_name", _ITEM_QUERY)
        )
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(25)
    )
    w = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 5)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


@register(
    "term_exact_update_view",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_type = 'PROMO' THEN 'PROMOTED' ELSE p_type END AS p_type_new
    FROM part WHERE p_brand = 'Brand#13'
    """,
    tags=("F13", "K8", "K9"),
)
def term_exact_update_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13+K9: term (exact) predicate + update-by-query
    (EsTest.scala:179-195 painless script) re-expressed as a
    conditional column rewrite — the engine's declarative UPDATE."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", "PROMOTED")
        .otherwise(F.col("p_type"))
        .alias("p_type_new"),
    )


# ---------------------------------------------------------------------------
# Small ES document ops (S6, K6, K7, F9, F15) — the EsTest.scala demo
# surface as warehouse-table view rewrites.
# ---------------------------------------------------------------------------


@register(
    "get_by_id",
    oracle="""
    SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS price
    FROM part WHERE p_partkey = 100
    """,
    tags=("S6",),
)
def get_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: point read of one doc (EsTest.scala:54-60 getById) — an
    equality filter Catalyst pushes into the parquet scan; on a
    key-bucketed warehouse layout this touches one file."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") == 100).select(
        "p_partkey", "p_name", "p_brand",
        F.round("p_retailprice", 2).alias("price"),
    )


@register(
    "delete_by_id_view",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey BETWEEN 95 AND 105 AND p_partkey <> 100
    """,
    tags=("K7",),
)
def delete_by_id_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: delete-by-id (EsTest.scala:160-163 DeleteRequest) as the
    declarative table rewrite ``table WHERE key <> id`` — the
    engine's DELETE (a Delta/Iceberg deployment would do the same
    rewrite transactionally). Windowed to ±5 keys so the oracle diff
    is readable."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_partkey").between(95, 105))
        .filter(F.col("p_partkey") != 100)
        .select("p_partkey", "p_brand")
    )


@register(
    "upsert_single_view",
    oracle="""
    SELECT p_partkey, p_brand FROM part WHERE p_partkey BETWEEN 95 AND 99
    UNION ALL
    SELECT -1 AS p_partkey, 'Brand#new' AS p_brand
    """,
    tags=("K6", "K8"),
)
def upsert_single_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: single idempotent put (EsTest.scala:224-235) as
    union-with-literal-row — one new doc appended to a keyed view;
    replay-safety comes from the key (see streaming.sinks for the
    batch-id variant)."""
    p = _t(spark, sf_dir, "part")
    base = p.filter(F.col("p_partkey").between(95, 99)).select(
        "p_partkey", "p_brand"
    )
    new_row = spark.range(1).select(
        F.lit(-1).cast("long").alias("p_partkey"),
        F.lit("Brand#new").alias("p_brand"),
    )
    return base.unionAll(new_row)


@register(
    "to_json_serialize",
    oracle="""
    SELECT '{"n_nationkey":' || n_nationkey || ',"n_name":"' || n_name || '"}'
           AS doc
    FROM nation
    """,
    tags=("F9",),
)
def to_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: bean→JSON serialization (JSON.toJSONString,
    OdsBaseLogApp.scala:130; MyEsUtils.scala:45) as ``to_json(struct)``
    — the exact bytes the Kafka/ES sinks would carry."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        F.to_json(F.struct("n_nationkey", "n_name")).alias("doc")
    )


@register(
    "highlight_match",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, 'widget', '<em>widget</em>', 'g')
             AS highlighted
    FROM part
    WHERE list_has_all(
        list_transform(string_split_regex(lower(trim(p_name)),
                                          '[^\\p{L}\\p{N}]+'), x -> x),
        ['widget'])
    """,
    tags=("F15", "F11"),
)
def highlight_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: ES highlight (EsTest.scala:92,105-108) — wrap every
    occurrence of the matched term in <em> tags over the match-AND
    result set; a cosmetic regexp_replace, kept JVM-side."""
    p = _t(spark, sf_dir, "part")
    return p.filter(match_all_terms("p_name", _ITEM_QUERY)).select(
        "p_partkey",
        F.regexp_replace("p_name", _ITEM_QUERY, f"<em>{_ITEM_QUERY}</em>")
        .alias("highlighted"),
    )


# ---------------------------------------------------------------------------
# OLAP analytics extensions beyond the reference's ES aggregations —
# the queries a user switching from the reference would expect an
# engine to also answer (percentiles, rollups, per-group top-N).
# ---------------------------------------------------------------------------


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont("value", 0.5), 6) AS p50,
           round(quantile_cont("value", 0.9), 6) AS p90,
           round(quantile_cont("value", 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("extension", "percentiles"),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation
    definition, so values hash-match. At 100 TB swap in
    ``approx_percentile`` (t-digest, one pass, mergeable) — exact
    percentile's per-group sort is the documented cost."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "value_percentiles_approx",
    oracle="""
    SELECT event_type,
           round(quantile_cont("value", 0.5), 6) AS p50_exact,
           TRUE AS approx_within_2pct
    FROM events GROUP BY event_type
    """,
    tags=("extension", "percentiles", "sketch"),
)
def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (mergeable
    one-pass sketch with map-side partial aggregation) instead of exact
    percentile's per-group sort. Same contract pattern as
    ``dau_approx_vs_exact``: compute BOTH, emit the exact value plus a
    checked |approx − exact| ≤ 2 % column the oracle pins to TRUE — a
    sketch-accuracy regression fails the gate. accuracy=10000 bounds
    rank error at 0.01 % of rows, far inside 2 % value error here."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__p50_approx"),
    )
    return agg.select(
        "event_type",
        "p50_exact",
        (
            F.abs(F.col("__p50_approx") - F.col("p50_exact"))
            <= F.abs(F.col("p50_exact")) * 0.02
        ).alias("approx_within_2pct"),
    )


@register(
    "revenue_rollup",
    oracle=f"""
    SELECT coalesce(n.n_name, 'ALL') AS nation,
           coalesce(c.c_mktsegment, 'ALL') AS segment,
           {_money_sum_sql("o.o_totalprice", 2)} AS revenue,
           count(*)::BIGINT AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    tags=("extension", "rollup"),
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (nation → segment → grand total) in one
    pass — Spark expands grouping sets inside a single aggregate
    (partial-agg friendly), no self-unions. NULL grouping slots are
    labeled 'ALL' so the hash compare is null-safe."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            _money_sum(F.col("o_totalprice"), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "top_orders_per_nation",
    oracle="""
    SELECT nation, o_orderkey, total FROM (
      SELECT n.n_name AS nation, o.o_orderkey,
             round(o.o_totalprice, 2) AS total,
             row_number() OVER (
               PARTITION BY n.n_name
               ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn <= 3
    """,
    tags=("extension", "top-n-per-group"),
)
def top_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per nation — a PARTITIONED rank window (25 keys ×
    per-key sort), the scale-safe form of per-group top-N; contrast
    with the global TakeOrdered used for un-grouped top-k."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("TPCH-Q3", "A3", "O3"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both join sides BEFORE the
    big shuffle (pushdown does the ordering), group on the join key,
    TakeOrdered top-10. The canonical filter→join→agg→top-k plan every
    warehouse engine must get right."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "forecast_revenue",
    oracle=f"""
    SELECT {_money_sum_sql("l_extendedprice * l_discount")} AS revenue,
           count(*)::BIGINT AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("TPCH-Q6", "F12"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    must reach the parquet scan (PushedFilters) and the plan is one
    codegen stage with a scalar partial agg; the measure of raw scan
    efficiency."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


@register(
    "returned_orders_by_priority",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("TPCH-Q4", "semi-join"),
)
def returned_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join. The semi join never
    materializes the probe side's columns and stops at the first match
    per key — at 100 TB this halves the shuffle vs an inner-join +
    distinct formulation, and the orders-side date filter is pushed to
    the scan before the shuffle."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "customers_no_big_orders",
    oracle="""
    SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
           round(avg(c_acctbal), 2) AS avg_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("TPCH-Q22", "anti-join"),
)
def customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS as a LEFT ANTI join. The orders side
    is filtered and projected to the join key alone before the shuffle,
    so the anti join moves 8 bytes per qualifying order regardless of
    table width."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


_PROMO_CASE = ("CASE WHEN p.p_type = 'PROMO' "
               "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")


@register(
    "promo_revenue_pct",
    oracle=f"""
    SELECT round(100.0 * {_money_sum_sql(_PROMO_CASE)}
                 / {_money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")},
                 6) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("TPCH-Q14", "conditional-agg"),
)
def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation computing a ratio in
    ONE pass (no self-join, no second scan). `part` is a per-SF-small
    dim here so Catalyst broadcasts it under AQE; the lineitem month
    filter reaches the parquet scan. Both legs of the ratio are
    integer-cents sums (_money_sum), so the percentage is identical
    under any partial-agg order."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * _money_sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
                )
                / _money_sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "brand_supplier_variety",
    oracle="""
    SELECT p.p_brand, count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 40
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    tags=("TPCH-Q16", "distinct-agg"),
)
def brand_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) alongside a plain SUM in one
    grouped aggregate. Catalyst plans this as the two-phase expand +
    partial-agg strategy, so the distinct does not force a second
    shuffle of the raw join output."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select("p_partkey", "p_brand")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    return (
        p.join(l, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("p_brand")
    )


@register(
    "large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS total_price,
           round(t.sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_price DESC, o.o_orderkey LIMIT 20
    """,
    tags=("TPCH-Q18", "having"),
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate lineitem FIRST (HAVING prunes to a
    handful of hot orders), then join the tiny survivor set back to
    orders/customer. Aggregating before joining is the scale move — the
    join input shrinks from billions of lineitems to the qualifying
    keys, and the final TakeOrdered never sees a global sort."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 300)
    )
    return (
        t.join(o, o.o_orderkey == t.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("__sq", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "sql_text_api",
    oracle=f"""
    SELECT l_returnflag,
           count(*)::BIGINT AS n,
           {_money_sum_sql("l_extendedprice", 2)} AS total
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("extension", "sql-api"),
)
def sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL entry point: register the warehouse tables
    as views (session.load_tables) and run Spark SQL text — a surface
    the reference doesn't have at all (its 'queries' are hand-built ES
    DSL). Demonstrates that every table is reachable via plain SQL."""
    from ..session import load_tables

    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)))
                    AS DOUBLE) / 100.0 AS total
        FROM lineitem GROUP BY l_returnflag
        """
    )


@register(
    "small_qty_order_revenue",
    oracle=f"""
    SELECT round({_money_sum_sql("l.l_extendedprice", 2)} / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 5
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("TPCH-Q17", "correlated-subquery"),
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold), hand-decorrelated into an aggregate + self-join.

    Scale design: the part filter prunes FIRST and is joined into
    lineitem before any aggregation, so the per-key avg is computed only
    over lineitems of qualifying parts — never a full-table group-by.
    Both the threshold aggregate and the final filter shuffle on the
    same key (l_partkey); the threshold side is one row per qualifying
    part, so AQE broadcasts it back. No window, so the avg gets map-side
    partial aggregation.
    """
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5))
        .select("p_partkey")
    )
    lj = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    thresh = lj.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("__qty_thresh")
    )
    return (
        lj.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(
            F.round(
                _money_sum(F.col("l_extendedprice"), 2) / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@register(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_9' AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10
    """,
    tags=("TPCH-Q21", "exists", "not-exists"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS and NOT EXISTS, decorrelated
    into a left-semi and a left-anti join on the shared order key
    (Q21's receipt/commit lateness becomes ``l_returnflag='R'`` — the
    test tables carry no receipt dates; the decorrelation under test
    is identical). 'Sole-blame' semantics: count, per supplier of a
    small nation, the returned items on finished multi-supplier orders
    where no OTHER supplier had a return.

    Scale shape: both existence probes shuffle on l_orderkey — the
    same key as the orders join, so AQE can reuse the exchange; the
    nation-filtered supplier dim broadcasts; the final top-10 is
    TakeOrdered, no global sort."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3")
    )
    base = (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        # no broadcast hint: supplier scales with SF (nation filter or
        # not) — AQE broadcasts while it fits and shuffles beyond
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("__ok2"))
            & (F.col("l_suppkey") != F.col("__sk2")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "leftanti",
        )
    )
    return (
        base.groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "nation_pair_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_money_sum_sql("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("TPCH-Q7", "role-playing-dim"),
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dim joined TWICE under different
    roles (supplier's nation vs customer's nation) with a cross-role
    pair predicate, then per-year volume.

    Scale shape: both nation joins are broadcast (fixed 25 rows per
    role); the pair predicate cannot prune lineitem at the scan (it
    spans two join paths) but the nation-filtered supplier and
    customer sides shrink their joins before the big lineitem⋈orders
    shuffle. One shuffle agg on (supp_nation, cust_nation, year) —
    tiny key space, map-side partials collapse it."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("__nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("__nk1")
    ).select("s_suppkey", "supp_nation")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("__nk2")
    ).select("c_custkey", "cust_nation")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {_money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name ORDER BY revenue DESC
    """,
    tags=("TPCH-Q5", "colocated-join"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the supplier and the customer
    share a nation — the nation equality rides the supplier join as a
    second equi-condition instead of a post-join filter.

    Scale shape: region⋈nation collapses to a 5-row broadcast that
    prunes supplier to one region's rows BEFORE the fact joins; orders
    is date-filtered at its scan. The two big shuffles (l⋈o on
    orderkey, then ⋈c on custkey) are unavoidable; supplier joins on
    (suppkey, nationkey) — a composite key, still one shuffle, and AQE
    broadcasts the region-pruned supplier while it fits."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@register(
    "market_share_by_year",
    oracle=f"""
    SELECT o_year,
           round({_money_sum_sql(
               "CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {_money_sum_sql("volume")}, 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) GROUP BY o_year ORDER BY o_year
    """,
    tags=("TPCH-Q8", "conditional-agg-ratio"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's volume per
    year — numerator and denominator in a single conditional
    aggregate, no self-join, no second scan.

    Scale shape: the selective dims prune both fact inputs before the
    big shuffles — part(type) shrinks lineitem via its join,
    region⋈nation broadcast shrinks customer; the supplier-nation name
    (n2) is a 25-row broadcast. The ratio divides two integer-cents
    sums (_money_sum) so both engines agree bit-for-bit under any
    summation order."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("__nk1"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__nk1"))
        .select("c_custkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__nk2"))
        .select("s_suppkey", "nation")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") <= "1997-12-31")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                _money_sum(
                    F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0)
                )
                / _money_sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ((sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 ::BIGINT) + 50) // 100) / 100.0 AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    tags=("TPCH-Q10", "top-k"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue per customer from returned items
    in one quarter, top 20.

    Scale shape: both fact scans carry their own filters (quarter on
    orders, returnflag on lineitem) so the l⋈o shuffle moves only
    qualifying rows; nation broadcasts; the final top-20 is
    TakeOrderedAndProject (per-partition partial top-k), never a
    global sort, with c_custkey as the deterministic tiebreak.

    The revenue sum accumulates exact integer ten-thousandths (the
    price×discount product has exactly 4 decimals) and rounds to
    cents in INTEGER arithmetic ((ths+50) div 100) — a double sum's
    order-dependent error put one group's total ON the 2-decimal
    rounding boundary, and even decimal-typed round diverges across
    engines (DuckDB's decimal division yields DOUBLE); integer
    half-up is bit-identical everywhere."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 10000
                ).cast("bigint")
            ).alias("__ths")
        )
        .withColumn(
            "revenue",
            F.expr("cast(((__ths + 50) div 100) as double) / 100.0"),
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "priority_shipping_counts",
    oracle="""
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
    tags=("TPCH-Q12", "conditional-agg"),
)
def priority_shipping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by status, split into high/low
    order priority via conditional aggregates in one pass (the test
    tables carry no l_shipmode/receiptdate; l_linestatus plays the
    grouping column — the join + dual conditional count under test is
    identical).

    Scale shape: the shipdate filter lands on the lineitem scan; one
    orderkey shuffle joins in the priority column; the 2-group
    aggregate collapses map-side."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("TPCH-Q13", "outer-join-histogram"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many orders —
    LEFT OUTER join so zero-order customers survive as c_count=0, then
    a histogram over the per-customer counts.

    Scale shape: the join predicate's orders-only conjunct
    (priority<>URGENT) is pushed to the orders scan, NOT applied
    post-join (which would wrongly drop the outer rows); two shuffles
    (custkey join+count, then the tiny histogram re-agg) — the second
    groups ~dozens of keys, its exchange is negligible."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {_money_sum_sql("l_extendedprice * (1 - l_discount)")}
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("TPCH-Q15", "agg-self-threshold"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) hitting the max quarterly revenue
    — the scalar-subquery threshold decorrelated into a single-row
    broadcast join against the same aggregate (ties all surface; no
    collect() round-trip through the driver).

    Scale shape: one shuffle builds per-supplier revenue; the max is a
    1-row frame broadcast back over it; supplier attaches via AQE's
    choice (broadcast at any realistic SF)."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(
            F.broadcast(mx), F.col("total_revenue") == F.col("__max_rev")
        )
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "disjunctive_part_revenue",
    oracle=f"""
    SELECT {_money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("TPCH-Q19", "disjunctive-pushdown"),
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning both join
    inputs (the test tables carry no p_container/l_shipmode; brand ×
    size × quantity branches exercise the same structure).

    Scale shape: the disjunction straddles the join, so Catalyst can't
    split it per table by itself — we conjoin the hand-derived
    single-table weakenings (brand∈{...} ∧ size≤15 on part;
    1≤quantity≤30 on lineitem), which reach the parquet scans as
    PushedFilters and shrink BOTH join inputs before the full
    predicate re-checks each surviving pair. Redundant by
    construction, free at the scan, decisive at 100 TB."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(br)
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "streaming_user_sessions_parity",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, "value",
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, "value",
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, new_session
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*)::BIGINT AS n_events,
           {_money_sum_sql('"value"', 2)} AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    HAVING max(ts) + INTERVAL 30 MINUTE
           <= (SELECT max(ts) FROM events) - INTERVAL 2 HOURS
    """,
    tags=("T6", "T7", "streaming", "session-window"),
)
def streaming_user_sessions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under REAL streaming state: gap-based per-user
    sessions (30 min) through Structured Streaming's merging
    session_window with a 2 h watermark — file source → session state
    → AvailableNow → memory sink, append mode. Sessions merge across
    micro-batches while open; append emits each exactly once when the
    watermark passes its end (last event + gap). The oracle derives
    the same sessions with the lag+cumsum islands technique and
    reproduces the emission rule as
    ``last_event + gap <= max(ts) − lateness`` — values AND
    finalization semantics under one gate."""
    from ..materialize import engine_tmpdir
    import uuid

    from ..sources.files import events_with_ts
    from ..streaming.pipelines import streaming_user_sessions

    _t(spark, sf_dir, "events")  # sets the nanos read conf
    raw = _stream_t(spark, sf_dir, "events")
    ev = events_with_ts(raw).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("event_time"),
        "value",
    )
    name = "sus_" + uuid.uuid4().hex[:8]
    q = (
        streaming_user_sessions(ev)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", engine_tmpdir("sus_ckpt_"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "streaming_state_profile_parity",
    oracle="""
    SELECT 'u' || (user_id % 50)::VARCHAR AS key,
           count(*)::BIGINT AS n_events,
           round(sum("value"), 2) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("T2", "T5", "streaming", "stateful"),
)
def streaming_state_profile_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom keyed-state operator (``applyInPandasWithState``,
    streaming/stateful.py) under the hard oracle: per-key running
    (count, sum) profiles maintained in the executor state store
    across micro-batches, emitted per batch in update mode; the
    LAST emission per key (max_by batch id) must equal the batch
    aggregate over all events. This is the typed, watermark-evictable
    generalization of the reference's Redis accumulator pattern
    (DAU:*/ORDERJOIN:* keyed state, DwdDauApp.scala:83-100).
    Cross-batch accumulation order is pinned by
    tests/test_streaming.py::test_apply_in_pandas_with_state_accumulates."""
    import os
    from ..materialize import engine_tmpdir
    import uuid

    from ..streaming.stateful import running_profiles

    _t(spark, sf_dir, "events")  # sets the temporal read confs
    raw = _stream_t(spark, sf_dir, "events")
    keyed = raw.select(
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias("key"),
        F.col("value"),
    )
    out_dir = engine_tmpdir("profile_parity_")

    def sink(bdf: DataFrame, bid: int) -> None:
        bdf.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={bid}"))

    q = (
        running_profiles(keyed)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", engine_tmpdir("profile_ckpt_")
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .queryName("prof_" + uuid.uuid4().hex[:8])
        .start()
    )
    q.awaitTermination()
    prof = spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    )
    return (
        prof.groupBy("key")
        .agg(
            F.max_by(
                F.struct("n_events", "sum_value"), F.col("batch")
            ).alias("p")
        )
        .select(
            "key",
            F.col("p.n_events").alias("n_events"),
            F.round("p.sum_value", 2).alias("sum_value"),
        )
    )


@register(
    "product_profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate)::INT AS o_year,
           {_money_sum_sql(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - round(p.p_retailprice * 0.6, 2) * l.l_quantity"
           )} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("TPCH-Q9", "multi-fact-join"),
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue − supply cost × quantity) by
    supplier nation and order year over a 5-way join. The test tables
    carry no partsupp, so supply cost is the deterministic
    ``round(p_retailprice · 0.6, 2)`` — the join topology and the
    mixed-sign aggregate under test are Q9's.

    Scale shape: the p_type filter prunes part before its join shrinks
    lineitem; supplier and orders join on their own keys (three
    shuffles over the fact — Q9's floor); the 25-row nation dim
    broadcasts. Money sums are exact-integer (see _money_sum)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.round(F.col("p_retailprice") * 0.6, 2) * F.col("l_quantity")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_money_sum(profit).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             round(0.01::DOUBLE * ((l_partkey * 7 + l_suppkey * 13) % 10000)
                   + 1.0, 2) AS ps_supplycost
      FROM lineitem),
    eligible AS (
      SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    mins AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM eligible GROUP BY ps_partkey)
    SELECT e.ps_partkey AS p_partkey, p.p_name, e.s_name,
           e.n_name AS nation, round(e.s_acctbal, 2) AS acctbal,
           e.ps_supplycost AS supplycost
    FROM eligible e
    JOIN mins m ON e.ps_partkey = m.ps_partkey
              AND e.ps_supplycost = m.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
    ORDER BY acctbal DESC, nation, s_name, p_partkey LIMIT 100
    """,
    tags=("TPCH-Q2", "groupwise-min"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the region's minimum-cost supplier per part —
    the correlated scalar subquery decorrelated into a groupwise-min
    aggregate joined back on (part, cost), ties surfacing naturally.
    The supply relation is synthesized from lineitem's distinct
    (part, supplier) pairs with a deterministic modular cost (the
    test tables carry no partsupp; the decorrelation under test is
    Q2's).

    Scale shape: region→nation broadcast prunes supplier BEFORE the
    supply-relation join; the groupwise min is one partial-agg
    shuffle on ps_partkey — the join-back reuses that key's
    partitioning; the final top-100 is TakeOrdered. The part filter
    lands on its scan."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_supplycost",
            F.round(
                0.01 * ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13)
                        % 10000)
                + 1.0,
                2,
            ),
        )
    )
    eligible = ps.join(s, F.col("ps_suppkey") == F.col("s_suppkey"))
    mins = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    return (
        eligible.join(
            mins.withColumnRenamed("ps_partkey", "__mpk"),
            (F.col("ps_partkey") == F.col("__mpk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name",
            F.col("n_name").alias("nation"),
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


#: synthesized supply relation shared by the Q2/Q11/Q20 shapes — the
#: test tables carry no partsupp, so cost/availqty derive
#: deterministically from the (part, supplier) pair.
_PS_SQL = """
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(0.01::DOUBLE * ((l_partkey * 7 + l_suppkey * 13) % 10000)
               + 1.0, 2) AS ps_supplycost,
         ((l_partkey * 3 + l_suppkey * 11) % 1000 + 1)::BIGINT AS ps_availqty
  FROM lineitem
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_supplycost",
            F.round(
                0.01 * ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13)
                        % 10000)
                + 1.0,
                2,
            ),
        )
        .withColumn(
            "ps_availqty",
            ((F.col("ps_partkey") * 3 + F.col("ps_suppkey") * 11) % 1000 + 1)
            .cast("bigint"),
        )
    )


@register(
    "important_stock_value",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    nat AS (
      SELECT ps.*,
             round(ps_supplycost * 100)::BIGINT * ps_availqty AS value_cents
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_9'),
    tot AS (SELECT sum(value_cents) AS total_cents FROM nat)
    SELECT ps_partkey,
           (sum(value_cents)::DOUBLE) / 100.0 AS part_value
    FROM nat, tot
    GROUP BY ps_partkey, tot.total_cents
    HAVING 1000 * sum(value_cents) > any_value(tot.total_cents)
    ORDER BY part_value DESC, ps_partkey
    """,
    tags=("TPCH-Q11", "global-fraction-threshold"),
)
def important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation exceeds
    a FRACTION (0.1 %) of that nation's total — the scalar-subquery
    threshold decorrelated into a 1-row broadcast, with the compare
    done in exact integer cents (1000·part > total) so neither
    engine's float summation order can flip a borderline part.

    Scale shape: nation-filtered supplier prunes the supply relation
    before its one partial-agg shuffle on ps_partkey; the grand total
    is a second aggregate of the same tiny intermediate, broadcast
    back as one row."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    nat = (
        _ps(spark, sf_dir)
        .join(s, F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "value_cents",
            F.round(F.col("ps_supplycost") * 100).cast("bigint")
            * F.col("ps_availqty"),
        )
    )
    per_part = nat.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("__cents")
    )
    tot = per_part.agg(F.sum("__cents").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(1000 * F.col("__cents") > F.col("__total"))
        .select(
            "ps_partkey",
            (F.col("__cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@register(
    "excess_stock_suppliers",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps JOIN shipped sh
        ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * sh.qty)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM excess e WHERE e.ps_suppkey = s.s_suppkey)
    ORDER BY s.s_name
    """,
    tags=("TPCH-Q20", "nested-semi-chain"),
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one nation holding more stock of
    some part than half of what they shipped in a year — a correlated
    aggregate comparison feeding a nested EXISTS, decorrelated into an
    aggregate join plus a LeftSemi chain.

    Scale shape: the shipped-quantity aggregate shuffles on the same
    (part, supplier) key as its join with the supply relation (one
    exchange reusable by AQE); the half-compare is exact (integral
    quantities sum exactly in doubles); the final probe is a semi
    join against the distinct excess-supplier keys."""
    ps = _ps(spark, sf_dir)
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = (
        ps.join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "leftsemi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


# --- record linkage: blocked fuzzy entity matching ------------------

#: segment-blocking knobs shared by the Spark query and its oracle:
#: 6 segments (pigeonhole needs max_dist+1=3; doubling the count
#: makes each block more selective on the synthetic fixed-prefix
#: names), edit cap 2, degenerate blocks (constant name prefix puts
#: a whole nation in one block) dropped past 200 rows — capped rows
#: still pair through their other, more selective segments.
_FUZZY_SEGS, _FUZZY_DIST, _FUZZY_CAP = 6, 2, 200

_FUZZY_ORACLE = f"""
WITH segs AS (
  SELECT c_custkey, c_name, c_nationkey, i,
         substring(c_name,
                   ((i * len(c_name)) // {_FUZZY_SEGS} + 1)::INT,
                   (((i + 1) * len(c_name)) // {_FUZZY_SEGS}
                    - (i * len(c_name)) // {_FUZZY_SEGS})::INT) AS seg
  FROM customer, range({_FUZZY_SEGS}) t(i)),
small AS (
  SELECT c_nationkey, i, seg FROM segs
  GROUP BY 1, 2, 3 HAVING count(*) <= {_FUZZY_CAP}),
blocked AS (SELECT s.* FROM segs s JOIN small USING (c_nationkey, i, seg)),
cands AS (
  SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM blocked a JOIN blocked b USING (c_nationkey, i, seg)
  WHERE a.c_custkey < b.c_custkey)
SELECT id_a, id_b, levenshtein(ca.c_name, cb.c_name) AS dist
FROM cands
JOIN customer ca ON ca.c_custkey = id_a
JOIN customer cb ON cb.c_custkey = id_b
WHERE levenshtein(ca.c_name, cb.c_name) <= {_FUZZY_DIST}
"""


@register(
    "customer_fuzzy_match",
    oracle=_FUZZY_ORACLE,
    tags=("linkage", "dedup", "extension"),
)
def customer_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the customer table
    (operators/linkage.py:blocked_fuzzy_pairs): nation pre-block +
    PassJoin-style segment co-blocking (6 segments — pigeonhole: ≤2
    substitutions on equal-length keys must leave ≥4 segments
    intact), degenerate blocks capped at 200, candidates verified
    with THRESHOLDED levenshtein ≤ 2 (the fuzzy analog of the
    reference's exact term match, PublishDaoImpl.java:58-61). The
    oracle replays the segment arithmetic, the cap, and the verify
    in SQL."""
    from ..operators.linkage import blocked_fuzzy_pairs

    return blocked_fuzzy_pairs(
        _t(spark, sf_dir, "customer"),
        id_col="c_custkey",
        text_col="c_name",
        block_cols=("c_nationkey",),
        max_dist=_FUZZY_DIST,
        n_segments=_FUZZY_SEGS,
        max_block=_FUZZY_CAP,
    )


# --- iterative graph analytics: PageRank over the order graph -------

def _pagerank_oracle(iters: int = 3) -> str:
    """CTE-chain replay of the integer PageRank loop: identical
    start/teleport/damping micro-units, identical truncating integer
    division (DuckDB ``//`` == Spark ``div`` on positive bigints), so
    every iterate is bit-identical and the final table hashes."""
    from ..operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_START,
        PR_TELEPORT,
    )

    chain = []
    prev = "r0"
    for k in range(1, iters + 1):
        chain.append(f"""i{k} AS (
  SELECT e.dst AS node,
         ({PR_TELEPORT} + ({PR_DAMP_NUM} * sum(r.r // d.d))
            // {PR_DAMP_DEN})::BIGINT AS r
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY 1)""")
        prev = f"i{k}"
    ctes = ",\n".join(chain)
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, -l_suppkey - 1 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
r0 AS (SELECT src AS node, {PR_START}::BIGINT AS r FROM deg),
{ctes}
SELECT node, r AS rank_micro FROM {prev}
"""


@register(
    "order_graph_pagerank",
    oracle=_pagerank_oracle(3),
    tags=("graph", "iterative", "extension"),
)
def order_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the bidirectional
    customer↔supplier order graph (operators/graph.py:pagerank) —
    the graph-native form of the reference's hot-actor terms ranking
    (EsTest.scala:128). All rank mass is INTEGER micro-units (the
    money_sum/micro-nat trick), so every aggregation is an
    order-independent bigint sum and the DuckDB oracle replays the
    loop as a CTE chain bit-identically — double-precision PageRank
    could never hash across engines. One shuffle per iteration;
    lineage cut per round via materialize(eager=True)."""
    from ..operators.graph import pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (-F.col("l_suppkey") - F.lit(1)).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    # distinct by construction: pairs is distinct and the two
    # directions live in disjoint id ranges — suppliers are NEGATED
    # (s = -l_suppkey - 1 < 0 < every custkey), a namespace no scaled
    # fixture can collide with (make_scaled's per-copy offset adds
    # positive BASE multiples, so an additive supplier offset would
    # merge with copy i+1's custkeys) — skip the operator's safety
    # dedup (a full edge-list shuffle at scale)
    return pagerank(edges, iters=3, dedup_edges=False)


# --- event-sequence analytics: funnel + retention --------------------

_FUNNEL_STAGES = ("view", "click", "purchase")

_FUNNEL_ORACLE = f"""
WITH t0 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY 1),
t1 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
  JOIN t0 ON e.user_id = t0.u AND e.ts > t0.t
  WHERE e.event_type = '{_FUNNEL_STAGES[1]}' GROUP BY 1),
t2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t FROM events e
  JOIN t1 ON e.user_id = t1.u AND e.ts > t1.t
  WHERE e.event_type = '{_FUNNEL_STAGES[2]}' GROUP BY 1)
SELECT 0 AS stage_idx, '{_FUNNEL_STAGES[0]}' AS stage,
       (SELECT count(*) FROM t0)::BIGINT AS n_users
UNION ALL
SELECT 1, '{_FUNNEL_STAGES[1]}', (SELECT count(*) FROM t1)::BIGINT
UNION ALL
SELECT 2, '{_FUNNEL_STAGES[2]}', (SELECT count(*) FROM t2)::BIGINT
"""


@register(
    "user_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("analytics", "sequence", "extension"),
)
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered first-touch funnel view → click → purchase
    (operators/funnel.py:funnel): a user completes stage k only with
    a stage-k event STRICTLY after their stage-(k−1) completion time
    — the sequence-aware follow-up to the reference's DAU "was
    active" question (DwdDauApp's first-visit filter). Each stage is
    one user-keyed aggregate joined back — k hash aggregates, never a
    per-user window sort over the whole log. The oracle chains the
    same min-ts CTEs."""
    from ..operators.funnel import funnel

    return funnel(_t(spark, sf_dir, "events"), list(_FUNNEL_STAGES))


@register(
    "streaming_funnel_parity",
    oracle=_FUNNEL_ORACLE,
    tags=("analytics", "sequence", "streaming"),
)
def streaming_funnel_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered funnel maintained INCREMENTALLY across real
    micro-batches (streaming/sinks.py:funnel_sink — the touched-user
    recompute pattern of scd2_sink): events stream in 4 batches in
    RANDOM order, so later batches deliver events earlier than ones
    already processed, and a late stage-0 arrival must retroactively
    move t_0 and cascade through the chain — funnel times are not
    batch-decomposable, which is exactly what this parity pins. The
    final per-user state folds to the same (stage, n_users) rows as
    the one-shot batch funnel; the oracle is user_funnel's,
    unchanged."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import funnel_sink, read_funnel

    ev = _t(spark, sf_dir, "events")
    root = engine_tmpdir("funnel_parity_")
    src = os.path.join(root, "src")
    ev.select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("event_time"),
    ).repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    state = os.path.join(root, "state")
    q = run_available_now(
        stream,
        funnel_sink(state, list(_FUNNEL_STAGES)),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="funnel_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return read_funnel(spark, state, list(_FUNNEL_STAGES))


_RETENTION_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
first AS (SELECT u, min(d) AS cohort FROM active GROUP BY 1)
SELECT cohort::VARCHAR AS cohort_date,
       datediff('day', cohort, d)::INT AS day_offset,
       count(*)::BIGINT AS n_active
FROM active JOIN first USING (u)
GROUP BY 1, 2
"""


@register(
    "user_retention_cohorts",
    oracle=_RETENTION_ORACLE,
    tags=("analytics", "sequence", "extension"),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix (operators/funnel.py:retention_cohorts):
    cohort = date of a user's FIRST event; cell (cohort_date,
    day_offset) counts cohort members active exactly offset days
    later (offset 0 = cohort size). Distinct (user, day) activity
    first — a chatty user costs one row per active day, not per
    event — then one tiny user-keyed join back."""
    from ..operators.funnel import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"))


@register(
    "streaming_retention_parity",
    oracle=_RETENTION_ORACLE,
    tags=("analytics", "sequence", "streaming"),
)
def streaming_retention_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention matrix maintained INCREMENTALLY
    (streaming/sinks.py:retention_sink): events stream in 4 arbitrary
    micro-batches, each banks only its distinct (user, day) frame —
    user-day activity is a SET, so distinct-over-union at read merges
    ANY split (cross-batch repeats included) to the one-shot corpus
    set, and a late-arriving OLDER event retroactively moves its
    user's cohort, which per-batch cohort assignment never could. The
    read fold is the one-shot operator's own
    (funnel.py:retention_from_active, shared verbatim) over (user,
    day) rows — facts are never rescanned. The oracle is
    user_retention_cohorts', unchanged."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_retention, retention_sink

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("event_time")
    )
    root = engine_tmpdir("retention_parity_")
    src = os.path.join(root, "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    state = os.path.join(root, "state")
    # compact_every=1: every batch folds the committed tail into a
    # new manifest generation (streaming/store.py), so this row
    # hash-gates the WHOLE compaction lifecycle — fold, atomic
    # manifest publish, deferred GC — against the batch oracle
    q = run_available_now(
        stream,
        retention_sink(state, compact_every=1),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="retention_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return read_retention(spark, state)


_ROLLING_ORACLE = """
WITH daily AS (
  SELECT n_name AS nation, o_orderdate::DATE AS d,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
  FROM orders o
  JOIN customer c ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT nation, strftime(d, '%Y-%m-%d') AS dt, rev_cents,
       (rev_cents - lag(rev_cents) OVER w)::BIGINT AS delta_rev_cents,
       sum(rev_cents) OVER (
         PARTITION BY nation ORDER BY d
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       )::BIGINT AS rolling_7d_rev_cents,
       sum(rev_cents) OVER (
         PARTITION BY nation ORDER BY d ROWS UNBOUNDED PRECEDING
       )::BIGINT AS cum_rev_cents
FROM daily
WINDOW w AS (PARTITION BY nation ORDER BY d)
"""


@register(
    "revenue_rolling_windows",
    oracle=_ROLLING_ORACLE,
    tags=("analytics", "timeseries", "extension"),
)
def revenue_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation daily revenue with the three sequence metrics a
    monitoring surface asks of any rollup (operators/timeseries.py:
    rolling_metrics): day-over-day delta (lag), trailing-7-CALENDAR-
    day rolling sum (RANGE frame over the day integer — gaps shorten
    the frame, matching SQL RANGE semantics), and the running total.
    Facts aggregate FIRST — one map-side-partial shuffle down to
    nation x day rows — and every window runs over that tiny rollup
    partitioned by nation, so no window ever sorts a fact row. All
    values are integer cents (the money convention): windowed bigint
    sums are order-independent, a windowed double would not be."""
    from ..operators.timeseries import rolling_metrics

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    rolled = rolling_metrics(daily, "nation", "d", "rev_cents", days=7)
    return rolled.select(
        "nation",
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "rev_cents",
        "delta_rev_cents",
        "rolling_7d_rev_cents",
        "cum_rev_cents",
    )


_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT n_name AS nation, o_orderdate::DATE AS d,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
  FROM orders o
  JOIN customer c ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
stats AS (
  SELECT nation, d, rev_cents,
         count(rev_cents) OVER w AS n,
         sum(rev_cents::HUGEINT) OVER w AS s,
         sum(rev_cents::HUGEINT * rev_cents) OVER w AS ss
  FROM daily
  WINDOW w AS (PARTITION BY nation ORDER BY d
               RANGE BETWEEN INTERVAL 28 DAY PRECEDING
                         AND INTERVAL 1 DAY PRECEDING))
SELECT nation, strftime(d, '%Y-%m-%d') AS dt, rev_cents,
       n::BIGINT AS baseline_n, s::BIGINT AS baseline_sum
FROM stats
WHERE n >= 8
  AND (rev_cents::HUGEINT * n - s) * (rev_cents::HUGEINT * n - s) * (n - 1)
      > 9 * (n * ss - s * s) * n
"""


@register(
    "revenue_anomaly_days",
    oracle=_ANOMALY_ORACLE,
    tags=("analytics", "timeseries", "quality", "extension"),
)
def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift tripwire over the same nation x day rollup
    as revenue_rolling_windows (operators/timeseries.py:anomaly_days):
    flag every day whose revenue sits outside 3 sample standard
    deviations of its own trailing-28-day baseline (current day
    EXCLUDED from the baseline judging it). The z-test is EXACT
    integer arithmetic — (x*n − s)^2*(n−1) > 9*(n*ss − s^2)*n in
    decimal(38,0)/HUGEINT — so the flag set is bit-deterministic
    across engines where a float z-score would flip at boundaries.
    Windows run over the tiny pre-aggregated rollup, never a fact
    row."""
    from ..operators.timeseries import anomaly_days

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    flagged = anomaly_days(
        daily, "nation", "d", "rev_cents",
        trailing=28, min_baseline=8, z=3,
    )
    return flagged.select(
        "nation",
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "rev_cents",
        "baseline_n",
        "baseline_sum",
    )


@register(
    "streaming_anomaly_parity",
    oracle=_ANOMALY_ORACLE,
    tags=("analytics", "timeseries", "quality", "streaming"),
)
def streaming_anomaly_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anomaly tripwire over an INCREMENTALLY-maintained rollup:
    orders stream in micro-batches, each batch's per-(nation, day)
    cent sums land in idempotent batch directories
    (streaming/sinks.py:rollup_sum_sink — integer sums merge over ANY
    batch split), and anomaly_days runs at READ time over the merged
    rollup — the architecture where the fact scan is incremental and
    a detector change (z, window, min_baseline) never reprocesses
    facts. A late batch can retroactively change any day's sum AND
    its successors' baselines; the merge-then-detect order makes that
    correct by construction. Must equal the one-shot batch query
    bit-for-bit (same oracle as revenue_anomaly_days)."""
    import uuid

    from ..materialize import engine_tmpdir
    from ..operators.timeseries import anomaly_days
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_rollup_sum, rollup_sum_sink

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    stream = (
        _stream_t(spark, sf_dir, "orders")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    path = engine_tmpdir("rollup_parity_") + "/rollup"
    q = run_available_now(
        stream,
        rollup_sum_sink(path, ("nation", "d"), "rev_cents"),
        checkpoint=engine_tmpdir("rollup_parity_ckpt_"),
        query_name="anom_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    daily = read_rollup_sum(spark, path, ("nation", "d"), "rev_cents")
    flagged = anomaly_days(
        daily, "nation", "d", "rev_cents",
        trailing=28, min_baseline=8, z=3,
    )
    return flagged.select(
        "nation",
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "rev_cents",
        "baseline_n",
        "baseline_sum",
    )


_COPURCHASE_ORACLE = """
WITH present AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT count(DISTINCT b)::BIGINT AS n FROM present),
item_n AS (SELECT i, count(*)::BIGINT AS c FROM present GROUP BY 1),
pairs AS (
  SELECT a.i AS item_a, b2.i AS item_b, count(*)::BIGINT AS pair_n
  FROM present a JOIN present b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT item_a, item_b, pair_n, na.c AS n_a, nb.c AS n_b,
       round((pair_n * n.n)::DOUBLE / (na.c * nb.c)::DOUBLE, 4) AS lift
FROM pairs
JOIN item_n na ON item_a = na.i
JOIN item_n nb ON item_b = nb.i, n
ORDER BY pair_n DESC, item_a, item_b
LIMIT 20
"""


@register(
    "part_copurchase_pairs",
    oracle=_COPURCHASE_ORACLE,
    tags=("analytics", "basket", "extension"),
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs with support and lift
    (operators/basket.py:copurchase_pairs — the a-priori L2 pass,
    Agrawal & Srikant 1994): the co-occurrence follow-up to the
    reference's single-entity popularity aggs. Pairs enumerate INSIDE
    each order (self-join keyed by the basket id — per-basket work is
    C(width, 2) with width ≤ 13 here, bounded by schema in any retail
    log), supports partial-aggregate map-side, lift is one
    fixed-order double division of exact int64 counts, top-k is
    TakeOrdered. The oracle replays the same pair algebra."""
    from ..operators.basket import copurchase_pairs

    return copurchase_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        k=20,
        min_pair_support=2,
    ).select(
        "item_a", "item_b", "pair_n", "n_a", "n_b", "lift"
    )


@register(
    "streaming_copurchase_parity",
    oracle=_COPURCHASE_ORACLE,
    tags=("analytics", "basket", "extension", "streaming"),
)
def streaming_copurchase_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL co-purchase maintenance under the batch oracle
    (streaming/sinks.py:copurchase_sink — the line_count_sink pattern
    applied to the a-priori L2 pass): lineitem arrives as a real
    Structured Streaming source in 4 BASKET-ATOMIC micro-batches (the
    staged source repartitions by order key, so every basket's rows
    travel together — the sink's decomposition contract), each batch
    contributes only its pair/item/basket partial counts to
    batch-keyed idempotent directories, and the merged top-k with the
    support threshold and lift applied over the FOLDED counts must
    hash-equal the one-shot part_copurchase_pairs — including pairs
    that cross min_support only across batches (retroactive support,
    which per-batch thresholding could never give). The oracle IS
    part_copurchase_pairs's, unchanged."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import copurchase_sink, read_copurchase

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    root = engine_tmpdir("copur_parity_")
    src = os.path.join(root, "src")
    li.repartition(4, F.col("basket")).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    state = os.path.join(root, "state")
    # compact_every=2: the 4-batch stream folds once mid-run, so the
    # read merges a compacted segment WITH live tail batches — the
    # mixed shape a long-lived store always has (streaming/store.py)
    q = run_available_now(
        stream,
        copurchase_sink(
            state, basket_col="basket", item_col="item", compact_every=2
        ),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="copur_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return read_copurchase(spark, state, k=20, min_pair_support=2)


_TRANSITION_ORACLE = """
WITH pairs AS (
  SELECT lag(event_type) OVER w AS from_event,
         event_type AS to_event,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
counts AS (
  SELECT from_event, to_event, count(*)::BIGINT AS n
  FROM pairs
  WHERE from_event IS NOT NULL AND gap_us <= 1800000000
  GROUP BY 1, 2),
totals AS (
  SELECT from_event, sum(n)::BIGINT AS total FROM counts GROUP BY 1)
SELECT from_event, to_event, n,
       round(n::DOUBLE / total::DOUBLE, 4) AS prob
FROM counts JOIN totals USING (from_event)
ORDER BY from_event, to_event
"""


@register(
    "event_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    tags=("analytics", "sequence", "extension"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between event types within
    30-minute sessions (operators/funnel.py:transition_matrix) — the
    dynamics of the reference's action/display events: which event
    FOLLOWS which, row-normalized. One per-user lag window (the
    user_sessions sort, microsecond-exact gap arithmetic in both
    engines), one map-side count into a |types|^2 matrix, broadcast
    row totals, fixed-order 4dp division."""
    from ..operators.funnel import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))


@register(
    "streaming_transition_parity",
    oracle=_TRANSITION_ORACLE,
    tags=("analytics", "sequence", "extension", "streaming"),
)
def streaming_transition_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Markov matrix maintained INCREMENTALLY
    (streaming/sinks.py:transition_sink — the funnel_sink touched-key
    pattern): events arrive as a real Structured Streaming source in
    4 ARBITRARILY-split micro-batches (a random 4-way repartition, so
    virtually every user's events straddle batches — the worst case:
    transitions are NOT batch-decomposable, a late event can insert a
    pair with or break the session gap to an earlier batch's event),
    each batch merges the deduped event store and recomputes ONLY the
    touched users' per-user pair counts, and the matrix folded from
    the maintained counts must hash-equal the one-shot
    event_transition_matrix. The oracle IS its oracle, unchanged."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_transition, transition_sink

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("event_time"),
    )
    root = engine_tmpdir("trans_parity_")
    src = os.path.join(root, "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    state = os.path.join(root, "state")
    q = run_available_now(
        stream,
        transition_sink(state),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="trans_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return read_transition(spark, state)


_TRIANGLE_ORACLE = """
WITH present AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
edges AS (
  SELECT a.i AS ea, b2.i AS eb
  FROM present a JOIN present b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY 1, 2),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT ea AS node FROM edges
    UNION ALL SELECT eb FROM edges) GROUP BY 1),
o AS (
  SELECT CASE WHEN da.deg < db.deg
                   OR (da.deg = db.deg AND ea < eb)
              THEN ea ELSE eb END AS src,
         CASE WHEN da.deg < db.deg
                   OR (da.deg = db.deg AND ea < eb)
              THEN eb ELSE ea END AS dst,
         CASE WHEN da.deg < db.deg
                   OR (da.deg = db.deg AND ea < eb)
              THEN db.deg ELSE da.deg END AS dd
  FROM edges JOIN deg da ON ea = da.node JOIN deg db ON eb = db.node),
w AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM o e1 JOIN o e2 ON e1.src = e2.src
   AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
tri AS (
  SELECT u, v, w FROM w JOIN o ON w.v = o.src AND w.w = o.dst),
per_node AS (
  SELECT node, count(*)::BIGINT AS t FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v FROM tri
    UNION ALL SELECT w FROM tri) GROUP BY 1)
SELECT node, deg, coalesce(t, 0)::BIGINT AS tri_n,
       CASE WHEN deg >= 2 THEN
         round((2 * coalesce(t, 0))::DOUBLE
               / (deg * (deg - 1))::DOUBLE, 4)
       ELSE 0.0 END AS clustering
FROM deg LEFT JOIN per_node USING (node)
ORDER BY tri_n DESC, node
LIMIT 20
"""


@register(
    "part_copurchase_triangles",
    oracle=_TRIANGLE_ORACLE,
    tags=("analytics", "graph", "extension"),
)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by exact triangle count through the co-purchase
    graph, with local clustering coefficient
    (operators/graph.py:triangle_stats — degree-ordered orientation,
    Schank & Wagner 2005 / Suri & Vassilvitskii 2011). Triangles are
    the community primitive the pair query can't see: a part whose
    co-purchase neighbors ALSO co-purchase each other anchors a
    bundle, not just a popular pair. Edges come from the same in-row
    basket pair enumeration as part_copurchase_pairs
    (operators/basket.py:copurchase_edges); orientation bounds wedge
    fan-out at O(m^1.5) total regardless of hub skew (the "last
    reducer" fix), and the closure probe is one composite-key
    equi-join. The oracle replays the identical (deg, id) total
    order, so both engines enumerate the same triangle set."""
    from ..operators.basket import copurchase_edges
    from ..operators.graph import triangle_stats

    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_support=1,
    )
    return (
        triangle_stats(edges, node_a="item_a", node_b="item_b")
        .orderBy(F.desc("tri_n"), F.asc("node"))
        .limit(20)
    )


_LINK_PRED_ORACLE = """
WITH present AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
edges AS (
  SELECT a.i AS ea, b2.i AS eb
  FROM present a JOIN present b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT ea AS node FROM edges
    UNION ALL SELECT eb FROM edges) GROUP BY 1),
adj AS (
  SELECT ea AS c, da.deg AS cd, eb AS n, db.deg AS nd
  FROM edges JOIN deg da ON ea = da.node JOIN deg db ON eb = db.node
  UNION ALL
  SELECT eb, db.deg, ea, da.deg
  FROM edges JOIN deg da ON ea = da.node JOIN deg db ON eb = db.node),
w AS (
  SELECT e1.n AS v, e2.n AS w,
         round(1e6 / ln(e1.cd))::BIGINT AS aa
  FROM adj e1 JOIN adj e2 ON e1.c = e2.c
   AND (e1.nd < e2.nd OR (e1.nd = e2.nd AND e1.n < e2.n))),
pairs AS (
  SELECT v, w, count(*)::BIGINT AS common_n, sum(aa)::BIGINT AS aa_micro
  FROM w GROUP BY 1, 2),
o AS (
  SELECT CASE WHEN da.deg < db.deg
                   OR (da.deg = db.deg AND ea < eb)
              THEN ea ELSE eb END AS src,
         CASE WHEN da.deg < db.deg
                   OR (da.deg = db.deg AND ea < eb)
              THEN eb ELSE ea END AS dst
  FROM edges JOIN deg da ON ea = da.node JOIN deg db ON eb = db.node),
open_pairs AS (
  SELECT p.* FROM pairs p ANTI JOIN o ON p.v = o.src AND p.w = o.dst)
SELECT v AS item_a, w AS item_b, common_n, aa_micro,
       round(aa_micro::DOUBLE / 1e6, 4) AS aa_score
FROM open_pairs
ORDER BY common_n DESC, aa_micro DESC, item_a, item_b
LIMIT 20
"""


@register(
    "part_link_prediction",
    oracle=_LINK_PRED_ORACLE,
    tags=("analytics", "graph", "extension"),
)
def part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted co-purchase links
    (operators/graph.py:link_prediction — common-neighbor count with
    Adamic-Adar tie-break, Liben-Nowell & Kleinberg 2003): part pairs
    NEVER strongly bought together whose STRONG-co-purchase
    neighborhoods (pair support >= 2 — link prediction wants signal
    edges, and the support-1 graph here is near-uniform deg ~115
    noise) overlap most — the collaborative-filtering candidate
    generator one hop past part_copurchase_pairs. Wedges enumerate
    over the full bidirectional adjacency (a common neighbor
    witnesses the pair regardless of triangle orientation — the
    oriented trick is closure-only); hub centers are boundable via
    max_degree (the max_bucket move, unused here). Adamic-Adar
    weights quantize to integer micro-units per wedge (deg >= 2
    wherever a wedge exists) and sum order-free; the canonical
    (deg, id) pair order matches the edge orientation so one
    left-anti equi-join drops existing links. The oracle replays the
    identical adjacency and micro-unit arithmetic."""
    from ..operators.basket import copurchase_edges
    from ..operators.graph import link_prediction

    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_support=2,
    )
    return link_prediction(
        edges, node_a="item_a", node_b="item_b", k=20
    )


@register(
    "part_link_prediction_pruned",
    oracle=_LINK_PRED_ORACLE,
    tags=("analytics", "graph", "extension"),
)
def part_link_prediction_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part_link_prediction with the EXACT threshold prune
    (operators/graph.py:link_prediction threshold_prune=True —
    PROBE_r12's residual-bottleneck fix): a hub-subset probe lower-
    bounds the k-th common-neighbor count τ, and the containment
    bound common_n(v,w) ≤ min(deg v, deg w) drops every wedge pair
    with min(deg) < τ BEFORE the pair shuffle — the shuffle the r12
    probe measured as the post-cap bottleneck (map-side combine
    cannot reduce ~wedge-count nearly-distinct pairs; this filter
    can). Subset top-k underestimates global top-k, so τ is always
    valid and the result must hash-equal the unpruned operator under
    the SAME oracle (it does — one oracle, two engine plans)."""
    from ..operators.basket import copurchase_edges
    from ..operators.graph import link_prediction

    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_support=2,
    )
    return link_prediction(
        edges, node_a="item_a", node_b="item_b", k=20,
        threshold_prune=True,
    )


_KEY_SKEW_ORACLE = """
WITH counts AS (
  SELECT user_id AS key, count(*)::BIGINT AS n FROM events GROUP BY 1),
hist AS (SELECT n, count(*)::BIGINT AS m FROM counts GROUP BY 1),
runs AS (SELECT n, m, sum(m) OVER (ORDER BY n) - m AS prev FROM hist),
stats AS (
  SELECT sum(m)::BIGINT AS n_keys, sum(n * m)::BIGINT AS n_rows,
         round((sum(n * m * (2 * prev + m + 1))
                - (sum(m) + 1) * sum(n * m))::DOUBLE
               / (sum(m) * sum(n * m))::DOUBLE, 6) AS gini
  FROM runs),
top AS (
  SELECT key, n,
         row_number() OVER (ORDER BY n DESC, key) AS rank,
         sum(n) OVER (ORDER BY n DESC, key) AS cum
  FROM counts ORDER BY n DESC, key LIMIT 10)
SELECT rank, key, n,
       round(n::DOUBLE / s.n_rows::DOUBLE, 6) AS share,
       round(cum::DOUBLE / s.n_rows::DOUBLE, 6) AS cum_share,
       s.n_keys, s.n_rows, s.gini
FROM top, stats s
ORDER BY rank
"""


@register(
    "events_key_skew",
    oracle=_KEY_SKEW_ORACLE,
    tags=("analytics", "profiling", "extension"),
)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over events.user_id
    (operators/profiling.py:key_skew_profile) — the report to read
    before keying a 100 TB shuffle: top-10 heaviest keys with share /
    cumulative share, and the EXACT integer Gini coefficient of the
    per-key count distribution, computed from the count HISTOGRAM
    (equal counts occupy a rank run whose Σ rank·count is
    order-free), so no corpus-wide sort ever happens — the only
    single-partition window runs over ≤ O(sqrt N) histogram rows. The
    oracle replays the identical run arithmetic."""
    from ..operators.profiling import key_skew_profile

    return key_skew_profile(
        _t(spark, sf_dir, "events"), key_col="user_id", k=10
    )


@register(
    "streaming_key_skew_parity",
    oracle=_KEY_SKEW_ORACLE,
    tags=("analytics", "profiling", "extension", "streaming"),
)
def streaming_key_skew_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew profiler maintained INCREMENTALLY: events arrive as a
    real Structured Streaming source in 4 micro-batches, each batch
    contributes only its per-key counts to batch-keyed idempotent
    directories (streaming/sinks.py:rollup_sum_sink — per-key counts
    are additive over ANY row split, so unlike the basket/line sinks
    this needs NO batch-atomicity contract), and the histogram/Gini/
    top-k profile computed over the folded counts at read time must
    hash-equal the one-shot events_key_skew. This is the production
    shape for the pre-salting diagnostic: the count state stays
    current per batch; profiling a 100 TB key never rescans facts.
    The oracle IS events_key_skew's, unchanged."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..operators.profiling import key_skew_profile
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_rollup_sum, rollup_sum_sink

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.lit(1).cast("bigint").alias("n")
    )
    root = engine_tmpdir("kskew_parity_")
    src = os.path.join(root, "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    state = os.path.join(root, "state")
    q = run_available_now(
        stream,
        rollup_sum_sink(state, key_cols=("key",), value_col="n"),
        checkpoint=os.path.join(root, "ckpt"),
        query_name="kskew_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    merged = read_rollup_sum(spark, state, key_cols=("key",), value_col="n")
    return key_skew_profile(df=None, key_col="key", k=10, counts=merged)


@register(
    "warehouse_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderdate < DATE '1995-01-01'
                THEN '(pre-migration)' ELSE o_orderpriority END
             AS priority,
           count(*)::BIGINT AS n,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders
    GROUP BY 1
    """,
    tags=("extension", "warehouse", "maintenance"),
)
def warehouse_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift END-TO-END (sources/warehouse.py:read_evolved):
    a warehouse whose producer added a column mid-stream — the
    era=v1 partition was written BEFORE ``o_orderpriority`` existed,
    era=v2 carries it — must still serve one coherent table.
    ``mergeSchema`` unions the per-file schemas (v1 rows read NULL
    for the late column; the default read would serve whichever
    footer the scan sampled first), and the aggregate relabels the
    NULLs as '(pre-migration)'. The oracle derives the same rollup
    from the raw facts, so the split/write/merge machinery — not a
    lookalike — is under test. All sums are exact integer cents."""
    from ..materialize import engine_tmpdir
    from ..sources.warehouse import read_evolved

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cutover = F.lit("1995-01-01").cast("date")
    path = engine_tmpdir("ev_schema_")
    # v1 era: the column does not exist yet
    orders.filter(F.col("o_orderdate") < cutover).select(
        "o_orderkey", "cents"
    ).write.mode("overwrite").parquet(path + "/era=v1")
    # v2 era: producer migrated, the column appears
    orders.filter(F.col("o_orderdate") >= cutover).select(
        "o_orderkey", "cents", "o_orderpriority"
    ).write.mode("overwrite").parquet(path + "/era=v2")
    merged = read_evolved(spark, path)
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("(pre-migration)")).alias(
            "priority"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


def _dd_best_cte(qs: tuple[float, ...]) -> str:
    """Shared DDSketch replay CTE chain (s, c, qv, hits, best) for
    the per-event-type quantile reads: identical baked ln-γ divisor,
    identical ceil bucketing, integer rank selection."""
    from ..operators.sketches import DD_ALPHA, _dd_ln_gamma

    qlist = ", ".join(f"{q!r}::DOUBLE" for q in qs)
    return f"""s AS (
  SELECT event_type,
         ceil(ln("value") / {_dd_ln_gamma(DD_ALPHA)!r})::BIGINT AS bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, bucket, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM s),
qv AS (SELECT unnest([{qlist}]) AS q),
hits AS (
  SELECT event_type, q, bucket, total
  FROM c, qv WHERE cum >= floor(q * (total - 1)) + 1),
best AS (
  SELECT event_type, q, min(bucket) AS b, max(total)::BIGINT AS n_rows
  FROM hits GROUP BY 1, 2)"""


def _dd_est_sql(col: str = "b") -> str:
    from ..operators.sketches import DD_ALPHA

    gamma = (1.0 + DD_ALPHA) / (1.0 - DD_ALPHA)
    return f"round(2.0 * power({gamma!r}, {col}) / {gamma + 1.0!r}, 6)"


def _ddsketch_oracle() -> str:
    """Replay of sketches.dd_sketch + dd_quantiles: identical baked
    ln-γ divisor, identical ceil bucketing, integer rank selection,
    one pow+round per answer."""
    return f"""
WITH {_dd_best_cte((0.5, 0.95, 0.99))}
SELECT event_type, q, {_dd_est_sql()} AS est, n_rows
FROM best
"""


def _winsorize_oracle() -> str:
    """Sketch-driven winsorization replay: the same DDSketch chain at
    (p01, p99), bounds pivoted per type, clip + exact-cents mean."""
    return f"""
WITH {_dd_best_cte((0.01, 0.99))},
bounds AS (
  SELECT event_type,
         max(CASE WHEN q = 0.01 THEN est END) AS lo,
         max(CASE WHEN q = 0.99 THEN est END) AS hi
  FROM (SELECT event_type, q, {_dd_est_sql()} AS est FROM best)
  GROUP BY 1),
clipped AS (
  SELECT e.event_type, b.lo, b.hi,
         round(least(greatest(e."value", b.lo), b.hi) * 100)::BIGINT
           AS cents
  FROM events e JOIN bounds b USING (event_type))
SELECT event_type, count(*)::BIGINT AS n, lo, hi,
       sum(cents)::BIGINT AS win_sum_cents,
       round(sum(cents)::DOUBLE / count(*)::DOUBLE / 100.0, 4)
         AS win_mean
FROM clipped GROUP BY event_type, lo, hi
"""


@register(
    "events_value_ddsketch",
    oracle=_ddsketch_oracle(),
    tags=("extension", "percentiles", "sketch"),
)
def events_value_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 from a DDSketch
    (operators/sketches.py:dd_sketch/dd_quantiles — Masson et al.
    2019): the MERGEABLE quantile path completing the sketch trio
    (count-min = heavy hitters, KMV = distinct, this = percentiles).
    Unlike approx_percentile's opaque JVM sketch, the bucket store is
    a (group, bucket, n) integer frame BOTH engines rebuild exactly —
    the oracle hash-checks the estimates themselves, not just an
    accuracy flag — and key-wise addition merges partial sketches
    from any partitioning or batch split."""
    from ..operators.sketches import dd_quantiles, dd_sketch

    sk = dd_sketch(
        _t(spark, sf_dir, "events"), "value", group_cols=("event_type",)
    )
    return dd_quantiles(
        sk, (0.5, 0.95, 0.99), group_cols=("event_type",)
    )


@register(
    "streaming_ddsketch_parity",
    oracle=_ddsketch_oracle(),
    tags=("extension", "percentiles", "sketch", "streaming"),
)
def streaming_ddsketch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentile maintenance: events arrive in real
    micro-batches, each batch's DDSketch bucket counts land in an
    idempotent batch-keyed rollup (streaming/sinks.py:
    rollup_sum_sink — integer sums merge over ANY batch split), and
    the quantile read runs over the merged sketch. Because the
    sketch is additive, the streamed result must be BIT-EQUAL to the
    one-shot batch sketch — same oracle as events_value_ddsketch,
    unchanged. This is how a 100 TB pipeline serves live percentile
    dashboards: the fact scan is incremental; a new quantile or a
    changed q never reprocesses facts."""
    import uuid

    from ..materialize import engine_tmpdir
    from ..operators.sketches import DD_ALPHA, _dd_ln_gamma, dd_quantiles
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_rollup_sum, rollup_sum_sink

    stream = _stream_t(spark, sf_dir, "events").select(
        "event_type",
        F.ceil(F.log(F.col("value")) / F.lit(_dd_ln_gamma(DD_ALPHA)))
        .cast("bigint")
        .alias("bucket"),
        F.lit(1).alias("one"),
    )
    path = engine_tmpdir("ddsketch_parity_") + "/sketch"
    q = run_available_now(
        stream,
        rollup_sum_sink(path, ("event_type", "bucket"), "one"),
        checkpoint=engine_tmpdir("ddsketch_parity_ckpt_"),
        query_name="dds_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    merged = read_rollup_sum(
        spark, path, ("event_type", "bucket"), "one"
    ).select("event_type", "bucket", F.col("one").alias("n"))
    return dd_quantiles(
        merged, (0.5, 0.95, 0.99), group_cols=("event_type",)
    )


_ATTRIBUTION_ORACLE = """
WITH o AS (
  SELECT o_orderkey AS oid, o_custkey AS u,
         (o_orderdate + INTERVAL 348 MONTH)::TIMESTAMP AS ots,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders),
t AS (
  SELECT o.oid, o.cents, e.event_type AS ch, e.ts, e.event_id
  FROM o JOIN events e
    ON e.user_id = o.u AND e.ts <= o.ots
   AND e.ts > o.ots - INTERVAL 7 DAY),
credited AS (
  SELECT ch, oid,
         cents // k + CASE WHEN rn = 1 THEN cents - k * (cents // k)
                           ELSE 0 END AS credit
  FROM (
    SELECT ch, oid, cents,
           count(*) OVER (PARTITION BY oid) AS k,
           row_number() OVER (
             PARTITION BY oid ORDER BY ts DESC, event_id DESC) AS rn
    FROM t)),
per_channel AS (
  SELECT ch AS channel, sum(credit)::BIGINT AS attributed_cents,
         count(*)::BIGINT AS n_touches,
         count(DISTINCT oid)::BIGINT AS n_orders
  FROM credited GROUP BY 1),
direct AS (
  SELECT '(direct)' AS channel, sum(cents)::BIGINT AS attributed_cents,
         0::BIGINT AS n_touches, count(*)::BIGINT AS n_orders
  FROM o ANTI JOIN t ON o.oid = t.oid
  HAVING count(*) > 0)
SELECT * FROM per_channel UNION ALL SELECT * FROM direct
ORDER BY channel
"""


@register(
    "order_touch_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("analytics", "attribution", "extension"),
)
def order_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear revenue attribution
    (operators/attribution.py:linear_attribution): every order's
    cents split EQUALLY across the user's events in the 7 days
    before it (the touch window), remainder cents to the last touch,
    untouched orders pooled in '(direct)' — so the attributed total
    reconciles to total revenue exactly, in integers. The touch join
    is the bucketed range join (user+bucket equi-join, never
    user-only); orders shift +348 months into the event era (the
    events_asof_last_order convention, aligned so the order stream
    overlaps the one-month event window). The oracle replays the
    credit arithmetic with truncating division."""
    from ..operators.attribution import linear_attribution

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.add_months("o_orderdate", 348).cast("timestamp").alias("ots"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return linear_attribution(
        orders,
        _t(spark, sf_dir, "events"),
        window_seconds=7 * 24 * 3600,
    )


_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey AS k, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0),
new AS (
  SELECT o_orderkey AS k, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 0.01
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0),
j AS (
  SELECT coalesce(o.k, n.k) AS k,
         CASE WHEN o.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
              THEN 'unchanged' ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN new n ON o.k = n.k)
SELECT status, count(*)::BIGINT AS n FROM j GROUP BY 1
"""


@register(
    "cdc_snapshot_diff",
    oracle=_SNAPSHOT_DIFF_ORACLE,
    tags=("extension", "cdc", "reconciliation"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/cdc.py:snapshot_diff): two
    deterministic order-table versions — keys %11==0 absent from the
    old export, %13==0 absent from the new, %5==0 repriced by one
    cent — classified added/removed/changed/unchanged in ONE
    co-partitioned full-outer key join with per-column null-safe
    equality (no row hashing: a new compare column can never flip
    another's verdict, and the oracle replays with IS NOT DISTINCT
    FROM). This is the convergence check a CDC pipeline runs against
    a periodic full re-export."""
    from ..operators.cdc import snapshot_diff_summary

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey"), "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 0.01
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff_summary(
        old, new, ("o_orderkey",), ("o_orderstatus", "o_totalprice")
    )


@register(
    "events_winsorized_stats",
    oracle=_winsorize_oracle(),
    tags=("extension", "percentiles", "sketch", "feature"),
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven robust scaling
    (operators/sketches.py:winsorized_stats): per-event-type
    winsorized mean with the clip bounds taken from the DDSketch p01/
    p99 estimates — heavy-tailed feature normalization in TWO scans
    at any corpus size (sketch build, clip+aggregate with the bounds
    broadcast back), never a per-group sort. The bounds are
    deterministic sketch reads, so every clipped value — and the
    exact-cents winsorized mean — hashes across engines."""
    from ..operators.sketches import winsorized_stats

    return winsorized_stats(
        _t(spark, sf_dir, "events"), "value", group_cols=("event_type",)
    )


@register(
    "streaming_attribution_parity",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("analytics", "attribution", "extension", "streaming"),
)
def streaming_attribution_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL attribution under the batch oracle: orders arrive
    as a real Structured Streaming source in 4 micro-batches, each
    batch runs the SAME linear_attribution core against the static
    event stream, and the per-channel partials land in batch-keyed
    idempotent directories. Every credit decision depends only on
    (order, its touches) and each order lives in exactly ONE batch,
    so the per-channel sums are additive over ANY batch split — the
    merged rollup must hash-equal the one-shot result, and the
    oracle IS order_touch_attribution's, unchanged. This is the
    production shape: attribute conversions as they land, never a
    full-history recompute."""
    import os
    import uuid

    from ..materialize import engine_tmpdir
    from ..operators.attribution import linear_attribution
    from ..streaming.pipelines import run_available_now
    from ..streaming.sinks import read_sink

    events = _t(spark, sf_dir, "events")
    orders_stream = _stream_t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.add_months("o_orderdate", 348).cast("timestamp").alias("ots"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = engine_tmpdir("attr_parity_")
    out = os.path.join(root, "partials")

    def attribute_batch(batch_df, batch_id: int) -> None:
        res = linear_attribution(
            batch_df, events, window_seconds=7 * 24 * 3600
        )
        res.write.mode("overwrite").parquet(
            os.path.join(out, f"batch={batch_id}")
        )

    q = run_available_now(
        orders_stream,
        attribute_batch,
        checkpoint=os.path.join(root, "ckpt"),
        query_name="attr_" + uuid.uuid4().hex[:8],
    )
    q.awaitTermination()
    return (
        read_sink(spark, out)
        .groupBy("channel")
        .agg(
            F.sum("attributed_cents").cast("bigint").alias(
                "attributed_cents"
            ),
            F.sum("n_touches").cast("bigint").alias("n_touches"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
        .orderBy("channel")
    )
