"""Scaling probe: the reference claims ~linear scan/agg/CTAS improvement
with compute units (white-papers/Integrating MicroStrategy...md:17;
BASELINE.md derived target #1).  This runs representative headline queries
at increasing local-core counts and prints per-config throughput so the
claim is checkable on any box:

    python scripts/scale_probe.py            # cores = 4, 8, 16, 32
    python scripts/scale_probe.py 2 8 32     # explicit ladder

Each config gets a fresh SparkContext (master=local[n]); timings are the
median of 3 runs after a warmup, so JIT/codegen noise doesn't pollute the
curve.  Perfect linearity is not expected at small data sizes (fixed
per-job scheduling costs dominate as task counts shrink) — the probe
reports the scaling efficiency so regressions in parallelizability show
up as a falling curve at the TOP end, where data is large enough to matter.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_data_warehouse_samples_spark import workload  # noqa: E402
from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = ["q01_pricing_summary", "d01_dedup_exact", "t02_quality_score"]


def run_config(cores: int) -> dict:
    spark = build_session(
        app_name=f"scale-probe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings = {}
        for name in PROBES:
            fn = workload.QUERIES[name]
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                reps.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(reps), 3)
        return timings
    finally:
        spark.stop()


def main() -> None:
    workload.load_all()
    ladder = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    results = {}
    for cores in ladder:
        results[cores] = run_config(cores)
    base = ladder[0]
    report = []
    for cores in ladder:
        total = sum(results[cores].values())
        speedup = sum(results[base].values()) / total if total else 0.0
        report.append(
            {
                "cores": cores,
                "total_sec": round(total, 3),
                "speedup_vs_first": round(speedup, 2),
                "efficiency": round(speedup / (cores / base), 2),
                "queries": results[cores],
            }
        )
    print(json.dumps({"sf_dir": SF_DIR, "ladder": report}))


if __name__ == "__main__":
    main()
