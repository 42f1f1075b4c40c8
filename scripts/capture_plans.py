"""Capture .explain("formatted") for headline queries to plans/r{N}/.

Usage:
    python scripts/capture_plans.py after [query ...]   # suffix, optional subset

The judge reads plans/r{N}/<query>_{before,after}.txt to check plan-shape
claims in OPTIMIZATION_r{N}.md; before-plans are captured at round start
by the same method (explain of the frame the query function returns, at
$SPARK_GRAFT_SF_DIR).  r13 hygiene rule (VERDICT r12 item 3): capture
under the EXACT bench configuration — no env overrides that suppress
exchanges the bench executes (the r12 after-plans were captured with the
scan spread silently disabled, hiding the exchange that caused the
regression).  SPARK_GRAFT_PLANS_ROUND picks the output dir (default r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2:])
    workload.load_all()
    import bench

    spark = build_session(app_name="sdw-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    names = [n for n in bench.HEADLINE if not only or n in only]
    for name in names:
        df = workload.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
