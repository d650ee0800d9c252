"""End-to-end correctness: every registry query vs its DuckDB oracle
at sf0.001 — the same comparison the driver's gate performs
(row count + column names + order-insensitive value hash)."""

from __future__ import annotations

import pytest

from sparkstreaming_realtime_spark.plans import REGISTRY

from scripts.check_oracle import table_hash


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert isinstance(srows, list)
        return
    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(scols, srows) == table_hash(ocols, orows)
