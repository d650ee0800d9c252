"""Targeted probe for link_prediction's max_degree hub cap
(VERDICT r11 #4): the registry query's support-2 "strong" graph goes
near-empty on the copy-scaled probe fixture (each copy inherits
sf0.01's sparse pair support), so the r11 ×100 row never measured the
wedge stage — the operator's whole scale story — under load.

This probe drops to the SUPPORT-1 graph (sf0.1: 20k nodes, 1.2M
edges, near-uniform degree ~119, 148M wedges — the non-degenerate
graph the verdict asked for) and times link_prediction capped vs
uncapped at the base SF and on a ×FACTOR disjoint-copy fixture built
FROM sf0.1 (make_scaled.py preserves per-copy degree structure, so
the scaled wedge volume is ×FACTOR of the base's dense graph — unlike
the standing sf0.01-based fixture, whose per-copy graph is ~10×
sparser than base and would again underfeed the wedge stage).

Cap choice: the base graph's median degree (119) — keeps 51% of wedge
centers and 35% of wedge volume (52M of 148M), so the cap genuinely
bites without emptying the graph.

Usage: python scripts/linkpred_probe.py [base_dir] [scaled_dir] [cap]
Writes one JSON line; run EXCLUSIVELY (probe protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkstreaming_realtime_spark.materialize import release_all
from sparkstreaming_realtime_spark.operators.basket import copurchase_edges
from sparkstreaming_realtime_spark.operators.graph import link_prediction
from sparkstreaming_realtime_spark.plans.queries import _t
from sparkstreaming_realtime_spark.session import get_spark


def _run(spark, sf_dir: str, max_degree: int | None) -> dict:
    release_all()
    t0 = time.time()
    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_support=1,
    )
    out = link_prediction(
        edges, node_a="item_a", node_b="item_b", k=20,
        max_degree=max_degree,
    )
    n = out.count()  # top-k — count forces the full plan
    return {"sec": round(time.time() - t0, 3), "rows": n}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scaled_sf01_x10"
    )
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 119
    spark = get_spark(app_name="linkpred-probe")
    res: dict = {
        "cap": cap,
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    # warm-up at the smallest SF so codegen is out of the timings
    _run(spark, "/root/testdata/sf0.001", cap)
    for label, d in (("base", base), ("scaled", scaled)):
        if not os.path.isdir(d):
            res[label] = {"error": f"missing dir {d}"}
            continue
        res[label] = {
            "dir": d,
            "capped": _run(spark, d, cap),
            "uncapped": _run(spark, d, None),
        }
    for label in ("base", "scaled"):
        leg = res.get(label, {})
        if "capped" in leg and leg["capped"]["sec"]:
            leg["uncapped_over_capped"] = round(
                leg["uncapped"]["sec"] / leg["capped"]["sec"], 2
            )
    if "capped" in res.get("base", {}) and "capped" in res.get("scaled", {}):
        res["scaling_capped"] = round(
            res["scaled"]["capped"]["sec"] / res["base"]["capped"]["sec"], 2
        )
        res["scaling_uncapped"] = round(
            res["scaled"]["uncapped"]["sec"] / res["base"]["uncapped"]["sec"],
            2,
        )
    res["loadavg_end"] = round(os.getloadavg()[0], 2)
    print("LINKPRED_PROBE " + json.dumps(res))


if __name__ == "__main__":
    main()
