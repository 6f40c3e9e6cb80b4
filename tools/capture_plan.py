"""Capture .explain("formatted") for named queries into plans/r13/<name>_<tag>.txt.

Usage: python tools/capture_plan.py <tag> <query> [query ...]
tag is e.g. "before" or "after".
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pipeline_excel_sql__spark.plans import QUERIES  # noqa: E402
from etl_pipeline_excel_sql__spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r13"


def main() -> None:
    tag, names = sys.argv[1], sys.argv[2:]
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF)
        plan = (
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        p = OUT / f"{name}_{tag}.txt"
        p.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {p} ({len(plan.splitlines())} lines, {n_ex} Exchange)")


if __name__ == "__main__":
    main()
