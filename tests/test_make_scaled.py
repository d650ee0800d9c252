"""The scaling generator's embedding transform must be injective per
copy (ADVICE r4): the circular shift alone cycles with period 63, so
copies i and i+63 used to apply the identical rotation — exact
duplicate vectors (and the quadratic pair-graph artifact the rotation
exists to prevent) reappeared past factor 63."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_copy_transforms_are_distinct_past_the_shift_period(spark):
    from scripts.make_scaled import _copy

    base = spark.createDataFrame(
        [(0, [float(j) for j in range(1, 65)])],
        "vec_id long, embedding array<float>",
    )

    def vec(i: int) -> tuple:
        row = _copy(base, "embeddings", i).collect()[0]
        return tuple(round(float(x), 4) for x in row["embedding"])

    # the old failure: copy 64 == copy 1, copy 65 == copy 2, ...
    assert vec(1) != vec(64)
    assert vec(2) != vec(65)
    assert vec(63) != vec(126)
    # block boundary: copy 64 starts a sign-flip block, shift resets
    assert vec(64) != vec(0 + 1)
    # a healthy spread of copies is pairwise distinct
    seen = {vec(i) for i in (0, 1, 2, 31, 63, 64, 65, 126, 127)}
    assert len(seen) == 9
    # copy 0 is the identity (base rows keep their vectors)
    assert vec(0) == tuple(round(float(j), 4) for j in range(1, 65))
