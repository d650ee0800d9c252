"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus run needs samples that are (a) reproducible across
reruns and engines (no ``rand()`` — a retry must pick the same rows),
(b) per-stratum tunable (downsample the majority language, keep the
tail), and (c) computable in a single scan with no shuffle. Hashing a
stable key and thresholding does all three: row selection becomes a
pure filter that Catalyst pushes into the scan, and the achieved rate
concentrates tightly around the target (Chernoff) at any scale.

The reference has no sampling surface at all; this is part of the
LLM-pipeline extension family (like ``doc_hash_split``, which handles
uniform train/val/test splits — this handles *per-stratum rates*).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, oracle_hash60_sql

#: Threshold denominator: rates are resolved to parts-per-million, so
#: engine-portable integer comparison decides membership (no float).
SCALE = 1_000_000


def _thresholds(rates: dict[str, float]) -> dict[str, int]:
    return {k: int(math.floor(v * SCALE)) for k, v in rates.items()}


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash60(key) mod SCALE < rate(stratum)·SCALE.

    One scan, zero shuffles: the stratum→threshold map is a literal
    CASE expression, and the hash-threshold predicate filters at the
    source. Strata absent from ``rates`` fall back to
    ``default_rate`` (0 ⇒ dropped)."""
    th = _thresholds(rates)
    cond: Column = F.lit(int(default_rate * SCALE))
    expr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in th.items() for x in kv]
            ),
            F.col(strata_col),
        ),
        cond,
    )
    bucket = hash60(F.col(key_col).cast("string")) % SCALE
    return df.filter(bucket < expr)


def oracle_stratified_sample_sql(
    strata_col: str, rates: dict[str, float], key_col: str, default_rate: float = 0.0
) -> str:
    """DuckDB WHERE-clause reproducing :func:`stratified_sample`."""
    th = _thresholds(rates)
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in th.items())
    case = f"CASE {strata_col} {whens} ELSE {int(default_rate * SCALE)} END"
    return f"({oracle_hash60_sql(f'{key_col}::VARCHAR')} % {SCALE}) < {case}"
