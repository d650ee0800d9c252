"""Skew mitigation: salted joins for hot keys.

AQE's skew-join (on in session.py) splits oversized *shuffle
partitions* automatically, which covers most batch cases. Salting is
still the right tool when AQE can't act: stream-static joins (no
runtime re-plan), hot keys inside a single partition-sized quantum,
or engines/configs without AQE. The helper keeps the rewrite
mechanical so callers don't hand-roll it wrong.

Shape: the big side gets a uniform random salt 0..salts-1; the small
side is replicated ``salts`` times (explode of a literal array — rows
× salts, fine for dim-sized inputs); the join key becomes (key, salt),
so one hot key spreads over ``salts`` reducers. Join semantics are
preserved exactly for inner/left joins because every big-side row
still meets every matching small-side row exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, salts: int, seed: int = 42) -> DataFrame:
    return df.withColumn(SALT_COL, (F.rand(seed=seed) * salts).cast("int"))


def replicate_small_side(df: DataFrame, salts: int) -> DataFrame:
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salts``
    reducers. ``how`` must be 'inner' or 'left' (semantics-preserving
    under replication); the salt column never escapes."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    b = salt_big_side(big, salts, seed)
    s = replicate_small_side(small, salts)
    return b.join(s, [on, SALT_COL], how).drop(SALT_COL)
