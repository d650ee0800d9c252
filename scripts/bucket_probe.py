"""PROBE r13: per-batch state-sink I/O must track TOUCHED buckets.

VERDICT r12 #1's done-criterion: after bucketing the touched-key
state sinks, show that a micro-batch's write volume follows the
touched-user fraction, not the store size. Protocol:

1. Seed a transition_sink store with the full sf events corpus
   (every bucket populated).
2. Re-deliver batches touching a decreasing fraction of users
   (100% → ~3% → ~0.4% → 1 user), each with fresh event ids so the
   merge does real work.
3. For each batch, inventory the state files before/after and count
   bytes in NEW/CHANGED files (= bytes the batch physically wrote to
   the store), plus the touched-bucket count and wall time.

Expected: bytes_written and wall time step down with touched buckets;
the 1-user batch rewrites ~2/n_buckets of the store (its one bucket
in both the events and pairs stores), not the corpus. Run EXCLUSIVELY
(memory rule: no pytest/oracle/bench sharing the machine).

Usage: python scripts/bucket_probe.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sparkstreaming_realtime_spark.session import get_spark  # noqa: E402
from sparkstreaming_realtime_spark.streaming.sinks import (  # noqa: E402
    transition_sink,
)


def inventory(root: str) -> dict[str, tuple[int, int]]:
    inv: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            try:
                st = os.stat(p)
            except OSError:
                continue
            inv[p] = (st.st_size, st.st_mtime_ns)
    return inv


def live_bytes(root: str) -> int:
    """Bytes in MANIFEST-referenced bucket dirs only: the r14 layout
    keeps superseded version dirs one batch for reader grace, so a
    raw directory total would overstate the live store."""
    import json as _json

    total = 0
    for sub in os.listdir(root):
        store = os.path.join(root, sub)
        mpath = os.path.join(store, "_STORE.json")
        if not os.path.isfile(mpath):
            continue
        with open(mpath) as f:
            meta = _json.load(f)
        for k, v in meta["ver"].items():
            d = os.path.join(store, f"b={int(k)}-v{v}")
            for dp, _dn, fns in os.walk(d):
                for fn in fns:
                    try:
                        total += os.stat(os.path.join(dp, fn)).st_size
                    except OSError:
                        pass
    return total


def bytes_written(before: dict, after: dict) -> int:
    """Bytes in new/changed files — the batch's physical write set."""
    return sum(
        sz for p, (sz, mt) in after.items() if before.get(p) != (sz, mt)
    )


def touched_dirs(before: dict, after: dict) -> set[str]:
    """Bucket dirs that gained new/changed files. r14 layout: a swap
    materializes a NEW ``b=<bucket>-v<ver>`` version dir per touched
    bucket (old versions stay in place for manifest-grace readers),
    so counting distinct buckets among changed paths still measures
    exactly the per-batch physical write set."""
    dirs = set()
    for p, v in after.items():
        if before.get(p) != v:
            seg = [
                s
                for s in p.split(os.sep)
                if s.startswith("b=") and "-v" in s
            ]
            if seg:
                bucket = seg[-1].split("-v")[0]
                dirs.add(p.split(os.sep)[-3] + "/" + bucket)
    return dirs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    import tempfile

    root = tempfile.mkdtemp(prefix="spark-graft-bucketprobe_")
    state = os.path.join(root, "state")
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("event_time"),
        )
    )
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    sink = transition_sink(state, n_buckets=n_buckets)
    legs = []

    print(f"# seeding store: {n_events} events, {n_users} users, "
          f"B={n_buckets}", flush=True)
    t0 = time.time()
    sink(ev, 0)
    seed_s = round(time.time() - t0, 2)
    store_bytes = live_bytes(state)
    print(f"# seeded in {seed_s}s, store={store_bytes} bytes", flush=True)

    # re-deliveries: same behavioral events, FRESH ids (so the merge
    # genuinely grows state), over a shrinking slice of users
    base = 10_000_000
    for frac_label, cond in [
        ("100%", F.lit(True)),
        ("~3%", F.col("user_id") % 32 == 0),
        ("~0.4%", F.col("user_id") % 256 == 0),
        ("1 user", F.col("user_id") == 42),
    ]:
        batch = ev.filter(cond).withColumn(
            "event_id", (F.col("event_id") + F.lit(base)).cast("long")
        )
        base += 10_000_000
        nb_users = batch.select("user_id").distinct().count()
        before = inventory(state)
        t0 = time.time()
        sink(batch, 1)
        wall = round(time.time() - t0, 2)
        after = inventory(state)
        wrote = bytes_written(before, after)
        total = live_bytes(state)
        dirs = touched_dirs(before, after)
        leg = {
            "touched_frac": frac_label,
            "touched_users": nb_users,
            "touched_bucket_dirs": len(dirs),
            "bytes_written": wrote,
            "store_bytes_after": total,
            "write_ratio": round(wrote / max(total, 1), 4),
            "wall_s": wall,
        }
        legs.append(leg)
        print(json.dumps(leg), flush=True)

    # --- auto-sized comparison (VERDICT r13 #3 done-criterion) ---
    # rebuild the store with n_buckets=None under a scaled-down
    # per-bucket target (the sf0.1 corpus is ~2.5 MB of state; the
    # production 128 MB target would clamp to the floor — shrinking
    # the target reproduces the store/target RATIO a production
    # store has, which is what the sizing math acts on), then
    # re-measure the sparse legs: touched-ratio should improve on
    # B=<fixed> because auto picks B from state size.
    auto_target = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    auto = None
    if auto_target:
        from sparkstreaming_realtime_spark.streaming import sinks as sk

        sk.AUTO_BUCKET_TARGET_BYTES = auto_target
        state2 = os.path.join(root, "state_auto")
        sink2 = transition_sink(state2)  # n_buckets=None: auto
        print(f"# seeding auto-sized store (target={auto_target}B)",
              flush=True)
        t0 = time.time()
        sink2(ev, 0)
        auto_seed_s = round(time.time() - t0, 2)
        auto_b = sk._load_bucket_meta(
            os.path.join(state2, "events")
        )["n_buckets"]
        auto_legs = []
        base2 = 900_000_000
        for frac_label, cond in [
            ("~0.4%", F.col("user_id") % 256 == 0),
            ("1 user", F.col("user_id") == 42),
        ]:
            batch = ev.filter(cond).withColumn(
                "event_id",
                (F.col("event_id") + F.lit(base2)).cast("long"),
            )
            base2 += 10_000_000
            before = inventory(state2)
            t0 = time.time()
            sink2(batch, 1)
            wall = round(time.time() - t0, 2)
            after = inventory(state2)
            wrote = bytes_written(before, after)
            total = live_bytes(state2)
            leg = {
                "touched_frac": frac_label,
                "touched_bucket_dirs": len(touched_dirs(before, after)),
                "bytes_written": wrote,
                "write_ratio": round(wrote / max(total, 1), 4),
                "wall_s": wall,
            }
            auto_legs.append(leg)
            print(json.dumps(leg), flush=True)
        auto = {
            "auto_target_bytes": auto_target,
            "auto_n_buckets": auto_b,
            "seed_wall_s": auto_seed_s,
            "store_bytes": live_bytes(state2),
            "legs": auto_legs,
        }

    out = {
        "probe": "bucketed_state_sink_io_r14",
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "n_events": n_events,
        "n_users": n_users,
        "seed_wall_s": seed_s,
        "seed_store_bytes": store_bytes,
        "legs": legs,
        "auto_sized": auto,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
