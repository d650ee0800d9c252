"""Market-basket pair enumeration (operators/basket.py):
hand-computed supports/lift on a tiny basket set, presence-not-
quantity dedup, the max_basket cap, and partitioning independence."""

from __future__ import annotations

from sparkstreaming_realtime_spark.operators.basket import (
    copurchase_pairs,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item_id long")


def test_copurchase_hand_computed_support_and_lift(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30),
        # duplicate presence: item 10 twice in basket 2 counts once
        (2, 10),
    ]
    out = copurchase_pairs(
        _baskets(spark, rows), k=10, min_pair_support=2
    ).collect()
    # only (10, 20) reaches support 2 (it has 3)
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.pair_n, r.n_a, r.n_b) == (
        10, 20, 3, 3, 3,
    )
    # lift = pair_n * n_baskets / (n_a * n_b) = 3*4/9
    assert r.lift == 1.3333


def test_copurchase_max_basket_drops_degenerate_baskets(spark):
    rows = [(1, i) for i in range(50)]  # one 50-wide mega-basket
    rows += [(2, 1), (2, 2), (3, 1), (3, 2)]
    out = copurchase_pairs(
        _baskets(spark, rows), k=10, min_pair_support=2, max_basket=10
    ).collect()
    assert [(r.item_a, r.item_b, r.pair_n) for r in out] == [(1, 2, 2)]
    # n counts exclude the dropped basket entirely
    assert out[0].n_a == 2 and out[0].lift == 1.0


def test_copurchase_partitioning_independent(spark):
    rows = [
        (b, (b * 7 + j) % 23) for b in range(40) for j in range(b % 5 + 2)
    ]
    df = _baskets(spark, rows)
    a = [tuple(r) for r in copurchase_pairs(df, k=15).collect()]
    b = [
        tuple(r)
        for r in copurchase_pairs(df.repartition(13), k=15).collect()
    ]
    assert a == b and len(a) > 0
