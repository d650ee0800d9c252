"""Capture ``explain("formatted")`` for named registry queries into
``plans/r<round>/<query>_<suffix>.txt`` — the judge-facing evidence
files for optimization rounds (VERDICT checks plan claims against
these captures).

Usage::

    python scripts/capture_plan.py <suffix> <query> [<query> ...] \
        [--round 15] [--sf-dir /root/testdata/sf0.1]

The capture runs the query builder (so streaming parities DO run
their pipelines — the returned frame's plan is what the driver
collects) and writes the formatted plan of the returned DataFrame.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_realtime_spark.plans import queries  # noqa: E402
from sparkstreaming_realtime_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix", help="before | after")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--round", type=int, default=15)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plan")
    qs = queries()
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
