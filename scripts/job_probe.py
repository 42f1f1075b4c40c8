"""Per-query cost decomposition (guide §1): split each declared query's
wall time into (a) DataFrame construction (Python expression-tree build),
(b) analysis+optimization (forcing the executed plan), and (c) execution
through the noop sink — plus the number of Spark jobs the query launches
(eager internal stages, control-plane collects and the final write all
count).  A query whose time is mostly (a)+(b) is driver-bound — the fix is
plan-size reduction, not shuffle work; a query with many jobs pays the
per-job dispatch floor that many times.

Usage:
    python scripts/job_probe.py --queries d21_incremental_neardup_ledger ...
    python scripts/job_probe.py --all-headline --json-out /tmp/job_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    workload.load_all()
    names = list(args.queries)
    if args.all_headline:
        import bench

        names = [n for n in bench.HEADLINE if n not in names] + names

    spark = build_session(app_name="sdw-job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker

    # warmup (untimed): codegen/JIT + Arrow worker pool, as in bench.py
    for name in names:
        materialize(workload.QUERIES[name](spark, WARM_DIR))

    result: dict[str, dict] = {}
    for rep in range(max(1, args.reps)):
        for name in names:
            fn = workload.QUERIES[name]
            group = f"probe-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)  # build (may run eager stages)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # analyze+optimize
            t2 = time.perf_counter()
            materialize(df)  # execute
            t3 = time.perf_counter()
            jobs_total = len(tracker().getJobIdsForGroup(group) or [])
            sc.setJobGroup("", "")
            r = result.setdefault(
                name,
                {"build": [], "plan": [], "exec": [], "total": [], "jobs": 0},
            )
            r["build"].append(round(t1 - t0, 3))
            r["plan"].append(round(t2 - t1, 3))
            r["exec"].append(round(t3 - t2, 3))
            r["total"].append(round(t3 - t0, 3))
            r["jobs"] = jobs_total

    print(f"{'query':38s} {'total':>7s} {'build':>7s} {'plan':>7s} {'exec':>7s} jobs")
    for name, r in sorted(result.items(), key=lambda x: -min(x[1]["total"])):
        print(
            f"{name:38s} {min(r['total']):7.3f} {min(r['build']):7.3f}"
            f" {min(r['plan']):7.3f} {min(r['exec']):7.3f} {r['jobs']:4d}"
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
