"""Measure the bench-SEQUENCE inflation the r8 verdict flagged:
`emb_ivf_topk` read 11.2 s on both in-sequence passes while its
isolated steady-state is ~1.3 s, and the first in-sequence passes of
`emb_semantic_dedup_auto` / `corpus_curation_funnel_v2` ran ~2× their
isolated steady-states. pass_spread can't see it (both passes inflate
equally), so this probe reproduces the bench sequence and then
dissects the suspect query in the SAME session:

phases
  A  bench warm-up + one full HEADLINE pass at the bench SF
     (the sequence — per-query seconds recorded)
  B  immediately re-time the suspects N times (still same session)
     → if B ≈ isolated steady-state, the inflation was neighbor
       load DURING the sequence, not session damage
  C  JVM forensics between runs: GC totals, shuffle/block dirs on
     disk, listener-bus queue size
  D  release_all + clearCache, re-time again
     → separates "leaked blocks/plan caches" from "GC/disk backlog"

Prints one JSON line with every measurement.
Usage: python scripts/seq_inflation_probe.py [sf_dir] [suspects_csv]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402 — the exact bench sequence
from sparkstreaming_realtime_spark.materialize import release_all  # noqa: E402
from sparkstreaming_realtime_spark.plans import queries  # noqa: E402
from sparkstreaming_realtime_spark.session import get_spark  # noqa: E402

SUSPECTS = ["emb_ivf_topk", "emb_semantic_dedup_auto", "corpus_curation_funnel_v2"]


def _jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_count = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_count += b.getCollectionCount()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    # shuffle/block files Spark has on local disk right now
    local_dirs = glob.glob("/tmp/blockmgr-*") + glob.glob(
        os.path.join(os.environ.get("SPARK_LOCAL_DIRS", "/tmp"), "blockmgr-*")
    )
    n_files = 0
    n_bytes = 0
    for d in set(local_dirs):
        for root, _dirs, files in os.walk(d):
            n_files += len(files)
            for f in files:
                try:
                    n_bytes += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return {
        "gc_ms": gc_ms,
        "gc_count": gc_count,
        "heap_used_mb": round(heap.getUsed() / 1e6),
        "shuffle_files": n_files,
        "shuffle_mb": round(n_bytes / 1e6),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }


def _run(qs, name, sf_dir, spark) -> float:
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    suspects = sys.argv[2].split(",") if len(sys.argv) > 2 else SUSPECTS
    spark = get_spark(app_name="seq_inflation_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out: dict = {"sf_dir": sf_dir, "suspects": suspects}

    # phase A: the bench protocol — warm-up at smallest SF, then ONE
    # full sequence pass at the bench SF
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001 — bench records these itself
            pass
    out["jvm_after_warmup"] = _jvm_stats(spark)
    seq: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            seq[name] = _run(qs, name, sf_dir, spark)
        except Exception as e:  # noqa: BLE001
            seq[name] = -1.0
            print(f"seq error {name}: {e}", file=sys.stderr)
    out["sequence_pass"] = seq
    out["jvm_after_sequence"] = _jvm_stats(spark)

    # phase B: suspects re-timed immediately, same session, 3 passes
    out["retime_same_session"] = {
        n: [_run(qs, n, sf_dir, spark) for _ in range(3)] for n in suspects
    }
    out["jvm_after_retime"] = _jvm_stats(spark)

    # phase D: clear engine state + JVM caches, re-time again
    release_all(clean_checkpoints=True)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    out["retime_after_clear"] = {
        n: [_run(qs, n, sf_dir, spark) for _ in range(2)] for n in suspects
    }
    out["jvm_after_clear"] = _jvm_stats(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
