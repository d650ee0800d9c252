"""Isolated query timer: run named registry queries N times each with
the noop sink (guide §1.4) on the standard session and print per-pass
seconds — the measure-first tool for optimization rounds.

Usage::

    python scripts/time_query.py q1 [q2 ...] [--n 3] \
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_realtime_spark.plans import queries  # noqa: E402
from sparkstreaming_realtime_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    ap.add_argument(
        "--warm", default="/root/testdata/sf0.001",
        help="warm-up SF dir ('' to skip warm-up)",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="time_query")
    qs = queries()
    for name in args.names:
        if args.warm:
            qs[name](spark, args.warm).write.format("noop").mode(
                "overwrite"
            ).save()
        ts = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"TIMING {name}: passes={ts} min={min(ts)}")


if __name__ == "__main__":
    main()
