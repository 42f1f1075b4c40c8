"""Per-job attribution for one declared query (guide §1.5/§7.1): run the
query once (warm), then list every Spark job it launched — description,
callsite name, duration, task count — via the UI REST API.  This is how a
33-job query gets its jobs itemized before any optimization touches it.

Usage:
    python scripts/job_trace.py d21_incremental_neardup_ledger [more...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    workload.load_all()
    spark = build_session(app_name="sdw-job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in names:  # warmup (codegen + caches) — untimed
        materialize(workload.QUERIES[name](spark, WARM_DIR))

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    for name in names:
        group = f"trace-{name}"
        sc.setJobGroup(group, name)
        materialize(workload.QUERIES[name](spark, SF_DIR))
        sc.setJobGroup("", "")
        ids = sorted(sc.statusTracker().getJobIdsForGroup(group) or [])
        print(f"\n== {name}: {len(ids)} jobs ==")
        tot = 0.0
        for jid in ids:
            with urllib.request.urlopen(f"{base}/jobs/{jid}") as r:
                j = json.load(r)
            dur = 0.0
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(j["completionTime"], fmt)
                    - datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
            tot += dur
            cs = (j.get("name") or "").split("\n")[0][:60]
            print(
                f"  job {jid:4d} {dur:7.3f}s tasks={j['numTasks']:4d} "
                f"stages={len(j['stageIds']):2d} {cs}"
            )
            for sid in sorted(j["stageIds"]):
                try:
                    with urllib.request.urlopen(
                        f"{base}/stages/{sid}?details=false"
                    ) as r:
                        attempts = json.load(r)
                except Exception:
                    continue
                for s in attempts:
                    if s.get("status") == "SKIPPED":
                        continue
                    print(
                        f"      stage {sid:4d} [{s['status']:9s}] "
                        f"tasks={s.get('numCompleteTasks', 0):4d} "
                        f"exec_ms={s.get('executorRunTime', 0):6d} "
                        f"cpu_ms={s.get('executorCpuTime', 0) // 1000000:6d} "
                        f"{(s.get('name') or '').split(chr(10))[0][:70]}"
                    )
        print(f"  sum of job durations: {tot:.3f}s")


if __name__ == "__main__":
    main()
