"""Capture .explain("formatted") for named queries into plans/<round>/<name>_<tag>.txt.

Usage: python tools/capture_plan.py [--sf DIR] [--round RDIR] <tag> <query> [query ...]

``tag`` is e.g. "before" or "after"; ``--sf`` defaults to
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1; ``--round`` defaults to
$SPARK_GRAFT_PLAN_ROUND or r14 (ADVICE r13: no hardcoded round/SF).
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pipeline_excel_sql__spark.plans import QUERIES  # noqa: E402
from etl_pipeline_excel_sql__spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--round", default=os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    )
    ap.add_argument("tag")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    out = Path(__file__).resolve().parent.parent / "plans" / args.round
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    out.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        df = QUERIES[name](spark, args.sf)
        # df._jdf.queryExecution() is the JVM bridge (classic sessions
        # only — a Connect session has no _jdf); explain(..., mode=...)
        # prints to stdout, so the bridge is what lets us capture the
        # formatted text to a file without redirecting fds.
        plan = (
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        p = out / f"{name}_{args.tag}.txt"
        p.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {p} ({len(plan.splitlines())} lines, {n_ex} Exchange)")


if __name__ == "__main__":
    main()
