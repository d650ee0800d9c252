"""PROBE r14: additive-store read cost must stop growing with stream
LIFETIME once manifest-committed compaction is on.

VERDICT r13's carried scale demand: every additive sink appended one
``batch=<id>`` directory per micro-batch forever (~43k dirs/day at
the reference's 2 s cadence), so read-side listing/planning cost grew
with how LONG the stream had been running, not how much state it
held. Protocol:

1. Drive N micro-batches (disjoint slices of the sf events corpus)
   through the SAME sink twice: ``compact_every=0`` (legacy,
   append-forever) vs ``compact_every=16`` (fold every 16 committed
   batches) — once for the fold-mode rollup store (key-wise sums,
   base bounded by key cardinality) and once for the append-mode raw
   store (idempotent_parquet_sink, size-tiered segments).
2. At checkpoints (N/4, N/2, N) measure the READ path: wall time of
   the store's own read fold collected to the driver (median of 3),
   plus on-disk directory and file counts.
3. Also record total write-side wall per config — compaction is paid
   inside the write path, so the delta is its amortized cost.

Expected: legacy read wall and dir counts grow ~linearly with batch
count; compacted stays ~flat (bounded by keys + tail), with a small
amortized write-side premium. Results must agree between configs
(hash of the folded rollup) — compaction must never change answers.

Run EXCLUSIVELY (memory rule: no pytest/oracle/bench on the machine).
Usage: python scripts/compaction_probe.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sparkstreaming_realtime_spark.session import get_spark  # noqa: E402
from sparkstreaming_realtime_spark.streaming.sinks import (  # noqa: E402
    idempotent_parquet_sink,
    read_rollup_sum,
    read_sink,
    rollup_sum_sink,
)


def fs_counts(root: str) -> tuple[int, int]:
    n_dirs = n_files = 0
    for _dp, dns, fns in os.walk(root):
        n_dirs += len(dns)
        n_files += len(fns)
    return n_dirs, n_files


def median_wall(fn, reps: int = 3) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(sorted(walls)[len(walls) // 2], 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark()
    import tempfile

    root = tempfile.mkdtemp(prefix="spark-graft-compactprobe_")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id",
        "user_id",
        F.lit(1).cast("bigint").alias("one"),
    )
    # disjoint deterministic slices — each batch does real merge work
    slices = [
        ev.filter(F.col("event_id") % n_batches == b).cache()
        for b in range(n_batches)
    ]
    checkpoints = sorted({n_batches // 4, n_batches // 2, n_batches})
    results = {"stores": []}

    # discarded warm-up: the first config measured would otherwise
    # carry JVM/JIT/codegen warm-up in its read walls
    warm = os.path.join(root, "warmup")
    wsink = rollup_sum_sink(warm, ("user_id",), "one", compact_every=0)
    for b in range(4):
        wsink(slices[b], b)
    for _ in range(2):
        read_rollup_sum(spark, warm, ("user_id",), "one").agg(
            F.count("*")
        ).collect()
    shutil.rmtree(warm, ignore_errors=True)

    for store_kind in ("rollup", "raw"):
        for label, every in (("legacy", 0), ("compact16", 16)):
            path = os.path.join(root, f"{store_kind}_{label}")
            if store_kind == "rollup":
                sink = rollup_sum_sink(
                    path, ("user_id",), "one", compact_every=every
                )

                def read_fold(p=path):
                    return (
                        read_rollup_sum(spark, p, ("user_id",), "one")
                        .agg(
                            F.count("*").alias("k"),
                            F.sum("one").alias("s"),
                        )
                        .collect()
                    )

            else:
                sink = idempotent_parquet_sink(
                    path,
                    key_cols=("event_id",),
                    partition_col=None,
                    compact_every=every,
                )

                def read_fold(p=path):
                    return (
                        read_sink(spark, p)
                        .agg(
                            F.count("*").alias("n"),
                            F.sum("one").alias("s"),
                        )
                        .collect()
                    )

            write_wall = 0.0
            marks = []
            for b in range(n_batches):
                t0 = time.time()
                sink(slices[b % len(slices)], b)
                write_wall += time.time() - t0
                if (b + 1) in checkpoints:
                    nd, nf = fs_counts(path)
                    marks.append(
                        {
                            "batches": b + 1,
                            "read_wall_s": median_wall(read_fold),
                            "n_dirs": nd,
                            "n_files": nf,
                        }
                    )
                    print(
                        json.dumps(
                            {"store": store_kind, "cfg": label, **marks[-1]}
                        ),
                        flush=True,
                    )
            fold_rows = read_fold()
            results["stores"].append(
                {
                    "store": store_kind,
                    "cfg": label,
                    "write_wall_s": round(write_wall, 2),
                    "checkpoints": marks,
                    "final_fold": [list(map(int, r)) for r in fold_rows],
                }
            )

    # answers must be identical between configs
    for kind in ("rollup", "raw"):
        folds = [
            s["final_fold"]
            for s in results["stores"]
            if s["store"] == kind
        ]
        assert folds[0] == folds[1], f"{kind}: compaction changed answers!"
    results["probe"] = "additive_store_compaction_r14"
    results["sf_dir"] = sf_dir
    results["n_batches"] = n_batches
    results["answers_match"] = True
    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
