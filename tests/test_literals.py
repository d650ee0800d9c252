"""functions.literals: the one-py4j-call literal builders must be
indistinguishable — dtype and bit-for-bit values — from the
element-wise ``F.lit`` trees they replaced (similarity's hyperplane /
centroid / codebook / dot-table literals ride them into every LSH and
IVF plan, and the DuckDB oracle re-derives the same constants from
Python, so even a 1-ulp drift would flip sign bits and break
hash parity)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from sparkstreaming_realtime_spark.functions.literals import (
    double_array_lit,
    double_matrix_lit,
    keyed_vector_lit,
)

TRICKY = [
    1e-05,
    -1e-300,
    1.7976931348623157e308,   # DBL_MAX
    5e-324,                   # smallest subnormal
    -0.0,
    3.0,
    0.1,
    -2.5e-10,
    123456789.123456789,
    2.2250738585072014e-308,  # smallest normal
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_double_array_lit_bit_exact(spark):
    df = spark.range(1)
    got = df.select(double_array_lit(TRICKY).alias("v")).collect()[0]["v"]
    assert [_bits(a) for a in got] == [_bits(x) for x in TRICKY]
    # dtype identical to the element-wise build
    old = df.select(
        F.array(*[F.lit(float(x)) for x in TRICKY]).alias("v")
    ).schema["v"].dataType
    new = df.select(double_array_lit(TRICKY).alias("v")).schema["v"].dataType
    assert old == new


def test_double_matrix_lit_matches_elementwise(spark):
    from sparkstreaming_realtime_spark.operators.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(6, 16)
    df = spark.range(1)
    old_col = F.array(
        *[F.array(*[F.lit(x) for x in plane]) for plane in planes]
    )
    a = df.select(old_col.alias("v"))
    b = df.select(double_matrix_lit(planes).alias("v"))
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_keyed_vector_lit_matches_struct_build(spark):
    cents = [(0, [0.5, -0.25]), (3, [1.0, 0.0]), (7, [-0.125, 2.0])]
    df = spark.range(1)
    old_col = F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("v"),
            )
            for cell, vec in cents
        ]
    )
    a = df.select(old_col.alias("c"))
    b = df.select(keyed_vector_lit(cents, "cell", "v").alias("c"))
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_non_finite_and_empty_raise():
    with pytest.raises(ValueError):
        double_array_lit([1.0, math.nan])
    with pytest.raises(ValueError):
        double_array_lit([math.inf])
    with pytest.raises(ValueError):
        double_array_lit([])
    with pytest.raises(ValueError):
        double_matrix_lit([])
    with pytest.raises(ValueError):
        keyed_vector_lit([], "cell", "v")
    with pytest.raises(ValueError):
        keyed_vector_lit([(2**40, [1.0])], "cell", "v")
