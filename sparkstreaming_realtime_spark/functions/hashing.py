"""Deterministic, engine-portable hashing.

The dedup/LSH operators need hash functions that (a) run JVM-side in
Spark, (b) can be reproduced *bit-for-bit* by the DuckDB oracle so the
driver's value-hash comparison works, and (c) are cheap. Spark's
``hash()``/``xxhash64()`` are murmur variants DuckDB doesn't expose,
so we standardize on **the top 60 bits of MD5**, which both engines
can compute exactly:

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
- DuckDB: fold the same 15 hex chars with ``list_reduce``

60 bits keeps the value inside a signed 64-bit integer in both
engines (no overflow, no sign surprises). Salted variants
``hash60(col, salt=i)`` give the independent hash families MinHash
needs (Broder 1997 — see PAPERS.md).

MD5 is ~2× slower than murmur but still JVM-side and vectorizable;
at 100 TB the dominant cost of MinHash is the shingle explosion, not
the hash. A production fork could switch to ``xxhash64`` once oracle
parity is no longer needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str, salt: int | None = None) -> Column:
    """Top 60 bits of md5(col [.. ':' salt]) as a non-negative bigint."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit(f":{salt}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def oracle_hash60_sql(expr: str, salt: int | None = None) -> str:
    """DuckDB SQL reproducing :func:`hash60` exactly (hex fold)."""
    if salt is not None:
        expr = f"({expr} || ':{salt}')"
    return (
        "list_reduce(list_transform("
        f"string_split_regex(substr(md5({expr}), 1, 15), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), "
        "(a, b) -> a * 16 + b)"
    )
